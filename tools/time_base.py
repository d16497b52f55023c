"""Time the flagship base MM-UNet eval (b8, stock config) on the TPU.
Usage: python tools/time_base.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from mm_diffusion_tpu.configs import create_model_config
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet

def fake_params(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)

def time_chained(fn_one, init_carry, n_chain=12, n_outer=2):
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

BATCH = int(os.environ.get("BB", "8"))
cfg = create_model_config(
    video_size="16,3,64,64", audio_size="1,25600", num_channels=128,
    num_res_blocks=2, num_head_channels=64,
    cross_attention_resolutions="2,4,8", cross_attention_windows="1,4,8",
    cross_attention_shift=True, video_attention_resolutions="2,4,8",
    audio_attention_resolutions="-1", use_scale_shift_norm=True,
    resblock_updown=True, use_fp16=True,
)
model = MultimodalUNet(cfg)
f, c, h, w = cfg.video_size
ca, l = cfg.audio_size
rngs = {"params": jax.random.PRNGKey(0), "shift": jax.random.PRNGKey(1)}
variables = fake_params(
    model, rngs,
    jnp.zeros((1, f, h, w, c)), jnp.zeros((1, l, ca)), jnp.zeros((1,), jnp.int32),
)
video = jax.random.normal(jax.random.PRNGKey(3), (BATCH, f, h, w, c))
audio = jax.random.normal(jax.random.PRNGKey(4), (BATCH, l, ca))
t = jnp.zeros((BATCH,), jnp.int32)

def base_eval(carry):
    v, a = carry
    vo, ao = model.apply(variables, v, a, t, rngs={"shift": jax.random.PRNGKey(2)})
    return (v * 0.99 + 0.1 * vo.astype(v.dtype), a * 0.99 + 0.1 * ao.astype(a.dtype))

t0 = time.perf_counter()
s = time_chained(base_eval, (video, audio))
print(f"base_eval_ms_b{BATCH}: {s*1000:.2f} (total wall {time.perf_counter()-t0:.0f}s)")
