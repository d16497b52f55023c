"""Orbax checkpointing of the full train state.

Replaces the reference's triple-file torch.save protocol
(`multimodal_train_util.py:470-539`: model{step}.pt + ema_{rate}_{step}.pt +
opt{step}.pt, step parsed from filenames, glob-based resume discovery) with a
single Orbax step directory holding the whole TrainState pytree
{params, opt_state, ema(s), sampler, step}.  Resume contract is identical:
point at a run directory and the latest step is found automatically.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


# One persistent manager per checkpoint directory.  A fresh manager per call
# (the previous design) forces synchronous saves; the cached manager enables
# Orbax's async commit path: ``save`` blocks only on the device→host staging
# copy (so the train step's donated buffers are safe) and the filesystem
# write proceeds in a background thread while training continues.
_MANAGERS: dict = {}


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    key = os.path.abspath(ckpt_dir)
    cached = _MANAGERS.get(key)
    if cached is not None:
        mgr, kept = cached
        # An explicit retention limit must not be silently ignored because a
        # read (latest_checkpoint_step) created the manager first — rebuild.
        if max_to_keep is not None and kept != max_to_keep:
            mgr.wait_until_finished()
            mgr.close()
        else:
            return mgr
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
    )
    mgr = ocp.CheckpointManager(key, options=options)
    _MANAGERS[key] = (mgr, max_to_keep)
    return mgr


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    max_to_keep: Optional[int] = None,
    block: bool = True,
):
    """Save the full train state under ``ckpt_dir/<step>/``.

    ``block=False`` returns after the host staging copy and lets the write
    commit in the background (call :func:`finalize` before reading the
    directory or exiting).  The reference's torch.save protocol is fully
    synchronous (multimodal_train_util.py:470-539)."""
    step = int(jax.device_get(state.step))
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if block:
        mgr.wait_until_finished()
    return step


def finalize(ckpt_dir: Optional[str] = None):
    """Block until pending async saves commit (one dir, or all)."""
    keys = [os.path.abspath(ckpt_dir)] if ckpt_dir else list(_MANAGERS)
    for k in keys:
        cached = _MANAGERS.get(k)
        if cached is not None:
            cached[0].wait_until_finished()


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    """Find the newest saved step (parity: find_resume_checkpoint,
    multimodal_train_util.py:517-530)."""
    if not os.path.isdir(ckpt_dir):
        return None
    return _manager(ckpt_dir).latest_step()


def restore_checkpoint(
    ckpt_dir: str, abstract_state: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore into the sharding/structure of ``abstract_state``."""
    mgr = _manager(ckpt_dir)
    mgr.wait_until_finished()  # a just-issued async save must be visible
    if step is None:
        step = mgr.latest_step()
    assert step is not None, f"no checkpoint found in {ckpt_dir}"
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    except Exception as e:
        raise RuntimeError(
            f"checkpoint restore failed for {ckpt_dir} step {step}. If this "
            "state predates the Dense [C,C] attention-output-projection layout "
            "(old layout: DenseGeneral [H,D,C]), it is incompatible — see "
            "docs/MIGRATION.md 'Native checkpoint layout history'."
        ) from e
    return restored


def save_params(path: str, params: Any):
    """Standalone parameter snapshot (e.g. EMA export for sampling)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def restore_params(path: str, abstract_params: Any = None):
    ckptr = ocp.StandardCheckpointer()
    if abstract_params is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), abstract_params)
