"""A/B the self-attention dispatch (pallas kernel vs XLA einsum reference)
at the exact shapes the base and SR models emit, on the current backend.

Drives the dispatch policy: pallas wins on big-T shapes; tiny shapes pay
~0.1-0.8 ms/call of launch + layout-copy overhead that XLA fuses away.

Usage: python tools/bench_attn_dispatch.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

from mm_diffusion_tpu.ops import block_attention as ba

# (tag, n, t, c) — head_dim 64 throughout (reference head_channels contract)
SHAPES = [
    # SR model (B=16 frames), attn at ds 8/16/32 of 256^2: 32^2@384, 16^2@768, 8^2@768
    ("sr_ds8_32x32x384", 16, 1024, 384),
    ("sr_ds16_16x16x768", 16, 256, 768),
    ("sr_ds32_8x8x768", 16, 64, 768),
    # base model (B=8, 16f): spatial at ds2/4/8 -> T=HW, n=B*F
    ("base_sp_ds2_32x32x256", 128, 1024, 256),
    ("base_sp_ds4_16x16x384", 128, 256, 384),
    ("base_sp_ds8_8x8x512", 128, 64, 512),
    # base temporal: T=F=16, n=B*H*W
    ("base_tmp_ds2_f16x256", 8 * 1024, 16, 256),
    ("base_tmp_ds4_f16x384", 8 * 256, 16, 384),
    ("base_tmp_ds8_f16x512", 8 * 64, 16, 512),
]


def timeit(fn, qkv, n_chain=40, n_outer=2):
    def chained(x):
        def body(c, _):
            o = fn(c, c.shape[-1] // 3 // 64)
            # feed output back through the qkv slot to serialize evals
            return jnp.concatenate([o, o, o], axis=-1).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=n_chain)
        return jnp.mean(c)
    compiled = jax.jit(chained)
    _ = jax.device_get(compiled(qkv))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(compiled(qkv))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    for tag, n, t, c in SHAPES:
        qkv = jax.random.normal(
            jax.random.PRNGKey(0), (n, t, 3 * c), jnp.bfloat16
        )
        heads = c // 64
        flops = 2 * 2 * n * t * t * c  # 2 matmuls
        try:
            ms_pal = timeit(lambda x, h: ba._dispatch_self_attention_local(x, h), qkv)
        except Exception as e:
            ms_pal = float("nan")
            print(f"  pallas failed: {e}")
        ms_ein = timeit(lambda x, h: ba.self_attention_reference(x, h), qkv)
        best = min(ms_pal, ms_ein)
        print(
            f"{tag:28s} n={n:5d} t={t:5d} c={c:4d} "
            f"pallas {ms_pal:7.3f} ms  einsum {ms_ein:7.3f} ms  "
            f"({flops/1e9:6.1f} GF, best {flops/best/1e9:6.0f} GF/s)"
        )


if __name__ == "__main__":
    main()
