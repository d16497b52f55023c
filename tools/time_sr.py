import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from mm_diffusion_tpu.configs import create_image_sr_config
from mm_diffusion_tpu.models.image_unet import ImageSuperResModel

def fake_params(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)

def time_chained(fn_one, init_carry, n_chain=10, n_outer=2):
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

sr_cfg = create_image_sr_config(
    large_size=256, small_size=64, sr_num_channels=192, sr_num_res_blocks=2,
    sr_attention_resolutions="32,16,8", sr_learn_sigma=True,
    sr_num_head_channels=64, sr_use_scale_shift_norm=True,
    sr_resblock_updown=True, use_fp16=True,
)
sr_model = ImageSuperResModel(sr_cfg)
sr_x = jax.random.normal(jax.random.PRNGKey(5), (16, 256, 256, 3))
sr_low = jax.random.normal(jax.random.PRNGKey(6), (16, 64, 64, 3))
sr_t = jnp.zeros((16,), jnp.int32)
sr_vars = fake_params(sr_model, {"params": jax.random.PRNGKey(7)}, sr_x[:1], sr_t[:1], sr_low[:1])

def sr_eval(carry):
    out = sr_model.apply(sr_vars, carry, sr_t, sr_low)
    return carry * 0.9 + 0.1 * out[..., :3].astype(carry.dtype)

t0 = time.perf_counter()
sr_s = time_chained(sr_eval, sr_x, n_chain=10)
print(f"sr_eval_ms_16f_256: {sr_s*1000:.2f} (total wall {time.perf_counter()-t0:.0f}s)")
