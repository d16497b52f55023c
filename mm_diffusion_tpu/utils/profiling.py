"""Tracing / profiling utilities.

Replaces the reference's wall-clock-only `logger.profile_kv` scopes
(logger.py:294-318) and `thop` FLOP-counter hooks (image_unet.py:307-324)
with TPU-native tooling:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable XPlane trace of device execution.
* :func:`flops_of` — XLA cost analysis of any jitted function (replaces
  thop's per-module hooks with compiler-exact totals).
* :func:`timed` — block-until-ready wall-clock timing of a jitted callable,
  the honest way to time async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compiler cost analysis (flops / bytes accessed) of ``jax.jit(fn)``."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis() or {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """Median-free simple timing with proper device sync.

    Returns ``(seconds_per_call, last_output)``.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def enable_debug_mode(nans: bool = True, disable_jit: bool = False):
    """Numerical-bug hunting mode (SURVEY §5 race-detection row): JAX purity
    removes data races; what remains is NaN propagation — enable global NaN
    checking (and optionally eager execution for line-level tracebacks)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
