"""Per-frame SR eval time vs frame-batch size.

The reference SRs the whole base batch in ONE forward — ``shape =
(b*f, c, large, large)`` (py_scripts/multimodal_sample_sr.py:188) — so the
SR stage may batch all clips' frames, not one clip at a time.  This measures
whether the 256^2 eval amortizes fixed overheads at larger frame batches.

Usage: python tools/bench_sr_batch.py [frames ...]
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

SR_SIZE = 256


def fake_params(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)


def time_chained(fn_one, init_carry, n_chain=6, n_outer=2):
    def chained(carry):
        def body(c, _):
            return fn_one(c), ()

        c, _ = jax.lax.scan(body, carry, None, length=n_chain)
        return sum(jnp.mean(l) for l in jax.tree_util.tree_leaves(c))

    compiled = jax.jit(chained)
    _ = jax.device_get(compiled(init_carry))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(compiled(init_carry))
    return (time.perf_counter() - t0) / (n_outer * n_chain)


def main():
    from mm_diffusion_tpu.configs import create_image_sr_config
    from mm_diffusion_tpu.models.image_unet import ImageSuperResModel

    frame_counts = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    sr_cfg = create_image_sr_config(
        large_size=SR_SIZE, small_size=64, sr_num_channels=192, sr_num_res_blocks=2,
        sr_attention_resolutions="32,16,8", sr_learn_sigma=True,
        sr_num_head_channels=64, sr_use_scale_shift_norm=True,
        sr_resblock_updown=True, use_fp16=True,
    )
    sr_model = ImageSuperResModel(sr_cfg)
    sr_vars = fake_params(
        sr_model, {"params": jax.random.PRNGKey(7)},
        jnp.zeros((1, SR_SIZE, SR_SIZE, 3)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 64, 64, 3)),
    )
    print("device:", jax.devices()[0])
    for frames in frame_counts:
        sr_x = jax.random.normal(jax.random.PRNGKey(5), (frames, SR_SIZE, SR_SIZE, 3))
        sr_low = jax.random.normal(jax.random.PRNGKey(6), (frames, 64, 64, 3))
        sr_t = jnp.zeros((frames,), jnp.int32)

        def sr_eval(carry):
            out = sr_model.apply(sr_vars, carry, sr_t, sr_low)
            return carry * 0.9 + 0.1 * out[..., :3].astype(carry.dtype)

        try:
            n_chain = max(4, min(10, 160 // frames))
            s = time_chained(sr_eval, sr_x, n_chain=n_chain)
            print(
                f"frames={frames:4d}: {s*1000:8.2f} ms/eval"
                f"  {s*1000/frames:7.3f} ms/frame"
                f"  ({s*1000*16/frames:7.2f} ms per 16f-equivalent)"
            )
        except Exception as e:
            print(f"frames={frames:4d}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
