"""Time the real-config b4 remat train step on the TPU. Usage:
  python tools/time_train.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

from mm_diffusion_tpu.configs import create_model_config, create_gaussian_diffusion
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.train.state import create_train_state, make_optimizer, make_train_step

tcfg = create_model_config(
    video_size="16,3,64,64", audio_size="1,25600", num_channels=128,
    num_res_blocks=2, num_head_channels=64,
    cross_attention_resolutions="2,4,8", cross_attention_windows="1,4,8",
    cross_attention_shift=True, video_attention_resolutions="2,4,8",
    audio_attention_resolutions="-1", use_scale_shift_norm=True,
    resblock_updown=True, use_fp16=True, use_checkpoint=True,
)
tmodel = MultimodalUNet(tcfg)
tdiff = create_gaussian_diffusion(steps=1000, noise_schedule="linear")
TB = int(os.environ.get("TB", "4"))
trng = jax.random.PRNGKey(0)
tparams = jax.jit(tmodel.init, static_argnames=("train",))(
    {"params": trng, "shift": trng, "dropout": trng},
    jnp.zeros((1, 16, 64, 64, 3)), jnp.zeros((1, 25600, 1)),
    jnp.zeros((1,), jnp.int32),
)["params"]
ttx = make_optimizer(lr=1e-4)
tstate = create_train_state(tparams, ttx, ema_rates=(0.9999,))
tstep = jax.jit(make_train_step(tmodel, tdiff, ttx), donate_argnums=0)
tbatch = {
    "video": jax.random.normal(trng, (TB, 16, 64, 64, 3), jnp.float32),
    "audio": jax.random.normal(trng, (TB, 25600, 1), jnp.float32),
}
t0 = time.perf_counter()
tstate, tm = tstep(tstate, tbatch, trng)
jax.block_until_ready(tm["loss"])
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        tstate, tm = tstep(tstate, tbatch, trng)
    jax.block_until_ready(tm["loss"])
    print(f"trial {trial}: {(time.perf_counter()-t0)/10*1000:.1f} ms/step (b{TB})")
