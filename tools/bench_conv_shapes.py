"""MXU shape law for the SR-stage convs: time 3x3/1x1 convs at the SR
decoder's 256^2 geometry across output-channel counts.

Answers VERDICT r3 next-step #1's Cout=192 pad question: if Cout=192 costs
the same as Cout=256, XLA pads the MXU N dim and the SR conv stage is
pad-limited (floor = ideal * 256/192); if it tracks 1.5x of Cout=128, the
remainder lanes are handled and the floor is the FLOP ideal.

Timing uses a serially-dependent lax.scan chain with a scalar readback —
python-loop + block_until_ready under-reports on the remote-transport
runtime (same approach as bench.py's time_chained).

Usage: python tools/bench_conv_shapes.py
"""

from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

F, S = 16, 256
PEAK = 197e12  # v5e bf16
N_CHAIN = 8
N_OUTER = 3


def time_chained(step, x0):
    def chained(x):
        def body(c, _):
            return step(c), ()

        c, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return jnp.float32(jnp.mean(c))

    compiled = jax.jit(chained)
    _ = jax.device_get(compiled(x0))
    t0 = time.perf_counter()
    for _ in range(N_OUTER):
        _ = jax.device_get(compiled(x0))
    return (time.perf_counter() - t0) / (N_OUTER * N_CHAIN) * 1000


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    for cin in (192, 384):
        x0 = jax.random.normal(key, (F, S, S, cin), jnp.bfloat16)
        # baseline: the chain glue (elementwise update) without the conv
        base_ms = time_chained(lambda c: c * 0.999 + 0.001, x0)
        print(f"cin={cin:4d} chain-glue baseline: {base_ms:7.3f} ms")
        for kk in (3, 1):
            for cout in (128, 192, 256, 384):
                k = jax.random.normal(key, (kk, kk, cin, cout), jnp.bfloat16)

                def step(c, k=k):
                    y = conv(c, k)
                    # fold a cheap scalar of y back into the carry to chain
                    return c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6

                ms = time_chained(step, x0) - base_ms
                flops = 2 * F * S * S * kk * kk * cin * cout
                eff = flops / (ms / 1e3) / PEAK
                print(
                    f"cin={cin:4d} k={kk} cout={cout:4d}: {ms:7.3f} ms"
                    f"  ({flops/1e9:8.1f} GFLOP, {eff*100:5.1f}% peak)"
                )


if __name__ == "__main__":
    main()
