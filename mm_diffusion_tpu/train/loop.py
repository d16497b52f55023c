"""The training loop orchestrator.

Re-design of the reference `multimodal_train_util.TrainLoop` (and the
single-modal `train_util.TrainLoop`): same responsibilities — resume, EMA,
periodic checkpoint + preview sampling, KV logging with loss quartiles — on
an SPMD execution model:

* one process drives the whole mesh (`jax.jit` + shardings) instead of one
  process per GPU under mpiexec;
* the train step (gradients, optimizer, EMA, schedule-sampler update) is a
  single donated jit — see `train/state.py`;
* checkpoints are Orbax step directories — see `train/checkpoint.py`.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.gaussian import GaussianDiffusion
from ..parallel import (
    batch_sharding,
    host_to_mesh,
    make_mesh,
    replicated,
    shard_batch,
    state_shardings,
)
from ..utils import logger as kvlogger
from . import checkpoint as ckpt_lib
from .resample import create_named_schedule_sampler
from .state import create_train_state, make_optimizer, make_train_step


def parse_ema_rates(ema_rate) -> Sequence[float]:
    """(parity: multimodal_train_util.py:64-68 comma-string EMA rates)"""
    if isinstance(ema_rate, (int, float)):
        return (float(ema_rate),)
    return tuple(float(x) for x in str(ema_rate).split(","))


class _DevicePrefetcher:
    """One-batch-ahead host->device pipeline.

    A daemon thread pulls the next host batch and stages it onto the mesh
    (``shard_batch`` = device_put) while the current step computes, so decode
    and host->device transfer overlap device work (SURVEY §7 step 5; the
    reference hides decode latency behind GPU work with DataLoader workers,
    multimodal_datasets.py:102).  Yields ``(host_batch, device_batch)`` — the
    host copy feeds condition-dependent previews.

    Multi-process note: every process prefetches its own local shard in FIFO
    order, so the k-th ``shard_batch`` (a collective-free global-array
    assembly) pairs up across processes exactly as the synchronous loop did.
    """

    _END = object()

    def __init__(self, data: Iterator, mesh, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._data = data
        self._mesh = mesh
        self._thread = threading.Thread(
            target=self._worker, name="mmdiff-prefetch", daemon=True
        )
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._data:
                self._q.put((batch, shard_batch(batch, self._mesh)))
        except BaseException as e:  # surface loader errors on the main thread
            self._q.put(e)
            return
        self._q.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


class TrainLoop:
    """Multimodal training loop (parity surface: multimodal_train_util.py:25-549).

    ``data`` yields numpy batches ``{"video": [B,F,H,W,C], "audio": [B,L,C]}``
    in [-1,1] — the global batch across the mesh.
    """

    def __init__(
        self,
        *,
        model,
        diffusion: GaussianDiffusion,
        data: Iterator[Dict[str, np.ndarray]],
        batch_size: int,
        lr: float = 1e-4,
        ema_rate="0.9999",
        log_interval: int = 100,
        save_interval: int = 10000,
        output_dir: str = "./output",
        resume_checkpoint: Optional[str] = None,
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        schedule_sampler: str = "uniform",
        accum_steps: int = 1,
        mesh=None,
        seed: int = 0,
        sample_fn: str = "dpm_solver",
        save_preview: bool = True,
        preview_samples: int = 4,
        init_params=None,
        min_size_to_shard: int = 2**18,
        task=None,
        use_db: bool = False,
    ):
        # NOTE: the loop takes OWNERSHIP of init_params — the jitted train
        # step donates the state, so the caller's arrays may be deleted
        # after the first step (pass jax.tree.map(jnp.copy, p) to keep them).
        from .tasks import MultimodalTask

        self.task = task if task is not None else MultimodalTask()
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.output_dir = output_dir
        self.sample_fn_name = sample_fn
        self.save_preview = save_preview
        self.preview_samples = preview_samples
        self.last_batch = None  # host copy, for condition-dependent previews
        if use_db and jax.process_index() == 0:
            # project/name derive from the output dir exactly like the
            # reference derives them from the logger dir
            # (multimodal_train_util.py:87-94); rank-0-only, gated on the
            # package being installed.
            import os as _os

            out_abs = _os.path.abspath(output_dir)
            kvlogger.get_current().enable_wandb(
                project=_os.path.basename(_os.path.dirname(out_abs))
                or "mm_diffusion_tpu",
                name=_os.path.basename(out_abs),
            )
        self.mesh = mesh if mesh is not None else make_mesh()
        # attention kernels shard_map over this mesh (tpu_custom_call has no
        # GSPMD partitioning rule — without this the kernels would force an
        # activation all-gather on multi-chip meshes)
        from ..ops.block_attention import set_kernel_mesh

        set_kernel_mesh(self.mesh if self.mesh.size > 1 else None)
        self.rng = jax.random.PRNGKey(seed)

        if init_params is None:
            self.rng, k_init = jax.random.split(self.rng)
            # jit the init (inside the task): eager per-op dispatch is
            # pathological on remote device transports
            init_params = self.task.init_params(model, k_init)

        self.tx = make_optimizer(lr, weight_decay, lr_anneal_steps)
        sampler = create_named_schedule_sampler(schedule_sampler, diffusion.num_timesteps)
        state = create_train_state(
            init_params, self.tx, parse_ema_rates(ema_rate), sampler=sampler
        )

        # resume (parity: _load_and_sync_parameters + find_resume_checkpoint)
        ckpt_dir = resume_checkpoint or f"{output_dir}/checkpoints"
        self.ckpt_dir = f"{output_dir}/checkpoints"
        latest = ckpt_lib.latest_checkpoint_step(ckpt_dir)
        if latest is not None:
            kvlogger.log(f"resuming from {ckpt_dir} step {latest}")
            state = ckpt_lib.restore_checkpoint(ckpt_dir, state, latest)

        # Place the state on the mesh.  With an fsdp axis of size 1 every
        # leaf resolves to a replicated sharding (the reference's param
        # broadcast, dist_util.py:72-78); with fsdp>1 params/EMA/Adam
        # moments shard ZeRO-3 style and XLA inserts the
        # all-gather / reduce-scatter pair around the step.
        self._state_sh = state_shardings(state, self.mesh, min_size_to_shard)
        self.state = host_to_mesh(state, self._state_sh)

        step_fn = make_train_step(
            model,
            diffusion,
            self.tx,
            accum_steps=accum_steps,
            train_rngs=self.task.train_rngs,
            adapter=self.task.adapter(model),
        )
        self._train_step = jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(self._state_sh, batch_sharding(self.mesh), None),
            out_shardings=(self._state_sh, replicated(self.mesh)),
        )

    # ------------------------------------------------------------------
    def run_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        return self._run_step_staged(batch, shard_batch(batch, self.mesh))

    def _run_step_staged(self, host_batch, device_batch) -> Dict[str, float]:
        self.last_batch = host_batch  # kept for condition-dependent previews
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, device_batch, step_rng)
        return metrics

    def run_loop(self, max_steps: Optional[int] = None):
        """(parity: run_loop, multimodal_train_util.py:222-265)

        Metrics stay as device scalars between log intervals — a per-step
        ``device_get`` blocks the dispatch pipeline on the host<->device
        round-trip (measured 700 -> ~500 ms/step on the remote-transport
        chip once the per-step fetches were removed)."""
        log = kvlogger.get_current()
        t_last = time.time()
        step = int(jax.device_get(self.state.step))
        pending = []
        # lazily wrap the data iterator once (per loop instance) so repeated
        # run_loop calls keep draining the same prefetch queue
        if not hasattr(self, "_prefetch"):
            self._prefetch = _DevicePrefetcher(self.data, self.mesh)

        def flush():
            if pending:
                for m in jax.device_get(pending):  # one sync per interval
                    log.logkvs_mean(m)
                pending.clear()

        # finally: deferred metrics must survive an exception/KeyboardInterrupt
        # mid-interval (ADVICE r2)
        try:
            while True:
                if max_steps is not None and step >= max_steps:
                    break
                with log.profile_kv("data"):
                    host_batch, device_batch = next(self._prefetch)
                metrics = self._run_step_staged(host_batch, device_batch)
                step += 1
                pending.append(metrics)
                if step % self.log_interval == 0:
                    flush()
                    now = time.time()
                    log.logkv("step", step)
                    log.logkv("steps_per_sec", self.log_interval / (now - t_last))
                    t_last = now
                    log.dumpkvs()
                if step % self.save_interval == 0:
                    self.save()
                    if self.save_preview:
                        try:
                            self.sample_preview(step)
                        except Exception as e:  # preview must never kill training
                            log.log(f"preview sampling failed: {e}")
        finally:
            flush()
            # drain the async checkpoint writer even on an exception /
            # KeyboardInterrupt — a logged mid-run save must be durable
            ckpt_lib.finalize(self.ckpt_dir)
        self.save()
        ckpt_lib.finalize(self.ckpt_dir)

    # ------------------------------------------------------------------
    def save(self):
        """(parity: save, multimodal_train_util.py:470-493)

        Multi-process: every process participates in the (distributed) Orbax
        save of the global sharded state; single-process detaches to host
        first so donation can't invalidate the buffers mid-write.  The save
        is asynchronous: it returns after host staging and commits in a
        background thread while training continues (the reference's
        torch.save stalls the step loop for the full write)."""
        state = (
            self.state if jax.process_count() > 1 else jax.device_get(self.state)
        )
        step = ckpt_lib.save_checkpoint(self.ckpt_dir, state, block=False)
        kvlogger.log(f"saving checkpoint step {step} -> {self.ckpt_dir} (async)")

    # ------------------------------------------------------------------
    def make_sampling_fn(self, params, sample_fn: Optional[str] = None, steps: int = 20):
        """Build a jittable batch sampler from given params (typically EMA)
        (parity: save_video's sampler dispatch, multimodal_train_util.py:373-416)."""
        from ..sampling import build_base_sampler

        return build_base_sampler(
            self.model,
            self.diffusion,
            params,
            sample_fn=sample_fn or self.sample_fn_name,
            steps=steps,
        )

    def sample_preview(self, step: int):
        """EMA-weight preview sampling + media dump, delegated to the task
        (multimodal: save_video parity, multimodal_train_util.py:348-468;
        SR: save_sr triptychs, train_util.py:566-671; single-modal video/
        audio: save_visual/save_audio, train_util.py:399,:485).  The task's
        primary media path streams to wandb when ``use_db`` is on (parity:
        multimodal_train_util.py:246-256)."""
        path = self.task.preview(self, step)
        if path:
            kvlogger.get_current().log_media(path, step=step)
