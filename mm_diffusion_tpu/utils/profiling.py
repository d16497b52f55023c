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


def parse_trace(trace_dir: str, top_n: int = 20):
    """Parse a `jax.profiler` trace directory into a per-op-category time
    breakdown (device plane, `%while` wrappers excluded).

    Uses the public XPlane schema vendored under ``utils/protos`` (the
    installed tensorboard profile plugin's converter is unusable here).
    Returns ``[(category, total_ms, count), ...]`` sorted by time.
    """
    import glob as _glob
    from collections import Counter

    from .protos import xplane_pb2

    files = _glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if "TPU" in p.name or "GPU" in p.name]
    if not planes:
        planes = [p for p in xs.planes if p.lines]
    plane = planes[0]
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    lines = [l for l in plane.lines if l.name == "XLA Ops"] or plane.lines

    def bucket(name: str) -> str:
        rhs = name.split(" = ")[1] if " = " in name else name
        if "custom-call" in rhs:
            return "custom-call (pallas)"
        head = name.split(" = ")[0].lstrip("%")
        return head.split(".")[0][:40]

    tot, cnt = Counter(), Counter()
    for line in lines:
        for ev in line.events:
            nm = ev_names.get(ev.metadata_id, "?")
            if nm.startswith("%while"):
                continue
            b = bucket(nm)
            tot[b] += ev.duration_ps
            cnt[b] += 1
    return [(k, ps / 1e9, cnt[k]) for k, ps in tot.most_common(top_n)]
