"""Dump the optimized HLO of the SR eval (the headline's hot program).

Writes the compiled module text to /tmp/sr_hlo.txt for fusion-structure
inspection (which passes stayed standalone, what dtypes the layout copies
move, where GN/SiLU landed).
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from mm_diffusion_tpu.configs import create_image_sr_config
from mm_diffusion_tpu.models.image_unet import ImageSuperResModel


def fake_params(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sr_hlo.txt"
    sr_cfg = create_image_sr_config(
        large_size=256, small_size=64, sr_num_channels=192, sr_num_res_blocks=2,
        sr_attention_resolutions="32,16,8", sr_learn_sigma=True,
        sr_num_head_channels=64, sr_use_scale_shift_norm=True,
        sr_resblock_updown=True, use_fp16=True,
    )
    model = ImageSuperResModel(sr_cfg)
    f = 16
    x = jnp.zeros((f, 256, 256, 3), jnp.bfloat16)
    low = jnp.zeros((f, 64, 64, 3), jnp.bfloat16)
    t = jnp.zeros((f,), jnp.int32)
    params = fake_params(model, jax.random.PRNGKey(0), x, t, low)

    def eval_fn(params, x, t, low):
        return model.apply(params, x, t, low)

    compiled = jax.jit(eval_fn).lower(params, x, t, low).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
