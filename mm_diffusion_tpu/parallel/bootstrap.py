"""Multi-host bootstrap.

TPU-native replacement for the reference's MPI rendezvous
(`dist_util.setup_dist`, dist_util.py:18-52: mpiexec process-per-GPU,
MASTER_ADDR broadcast, NCCL init).  On TPU pods the runtime already knows
the topology; ``jax.distributed.initialize()`` wires multi-host, and the
same mesh code then spans all hosts' devices transparently (collectives ride
ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def setup_dist(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX when running under a multi-process launcher.

    No-ops on a single host (the common dev case), exactly as the reference's
    setup degenerates for one rank.  On TPU pods with the standard runtime,
    calling with no arguments auto-discovers the topology.
    """
    if num_processes is not None and num_processes <= 1:
        return
    already = os.environ.get("JAX_DIST_INITIALIZED")
    if already:
        return
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        os.environ["JAX_DIST_INITIALIZED"] = "1"
    except Exception:
        if explicit:
            # the caller asked for a real multi-process rendezvous — a silent
            # downgrade to single-process would train on 1/N of the data with
            # no warning (the exact failure mode the reference's Gloo branch
            # warns about, multimodal_train_util.py:141-145)
            raise
        # auto-detect on a single host: nothing to do


def device_info() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()} — "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
