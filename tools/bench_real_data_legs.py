"""Leg-by-leg timing of the bench real-data train probe: which of
next(prefetcher) / tstep(fresh batch) / tstep(device-resident batch)
carries the 35 s/step the composed probe measures on the tunneled chip?"""
import sys, os, time, shutil, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from mm_diffusion_tpu.configs import create_gaussian_diffusion, create_model_config
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.train.state import create_train_state, make_optimizer, make_train_step
from mm_diffusion_tpu.data.media import save_multimodal
from mm_diffusion_tpu.data.video import load_data as load_real
from mm_diffusion_tpu.train.loop import _DevicePrefetcher
from mm_diffusion_tpu.parallel import make_mesh

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
TB = 4
trng = jax.random.PRNGKey(0)
tparams = jax.jit(tmodel.init, static_argnames=("train",))(
    {"params": trng, "shift": trng, "dropout": trng},
    jnp.zeros((1, 16, 64, 64, 3)), jnp.zeros((1, 25600, 1)), jnp.zeros((1,), jnp.int32),
)["params"]
ttx = make_optimizer(lr=1e-4)

media_dir = tempfile.mkdtemp(prefix="legs_media_")
rng_np = np.random.RandomState(0)
for i in range(6):
    vid = rng_np.randint(0, 255, (48, 64, 64, 3), np.uint8)
    aud = (rng_np.uniform(-0.5, 0.5, (16000 * 5, 1))).astype(np.float32)
    save_multimodal(vid, aud, f"{media_dir}/clip_{i:02d}", fps=10)
data_it = load_real(
    data_dir=media_dir, batch_size=TB, video_size=(16, 3, 64, 64),
    audio_size=(1, 25600), video_fps=10.0, audio_fps=16000,
    num_workers=4, shard=0, num_shards=1,
)
mesh1 = make_mesh()
pf = _DevicePrefetcher(data_it, mesh1)
tstate = create_train_state(jax.tree.map(jnp.copy, tparams), ttx, ema_rates=(0.9999,))
tstep = jax.jit(make_train_step(tmodel, tdiff, ttx), donate_argnums=0)
_, dev0 = next(pf)
t0 = time.perf_counter()
tstate, tm = tstep(tstate, dev0, trng)
jax.block_until_ready(tm["loss"])
print(f"first step (compile/warm): {time.perf_counter()-t0:.1f} s")

# leg A: next(pf) alone
for tag in ("A1", "A2", "A3"):
    t0 = time.perf_counter()
    _, dev = next(pf)
    jax.block_until_ready(dev)
    print(f"{tag} next(pf)+ready: {time.perf_counter()-t0:.2f} s")

# leg B: step on a device-resident batch, blocking each time
for tag in ("B1", "B2", "B3"):
    t0 = time.perf_counter()
    tstate, tm = tstep(tstate, dev, trng)
    jax.block_until_ready(tm["loss"])
    print(f"{tag} tstep(resident): {time.perf_counter()-t0:.2f} s")

# leg C: the composed loop exactly as bench.py does it
t0 = time.perf_counter()
for _ in range(3):
    _, dev = next(pf)
    tstate, tm = tstep(tstate, dev, trng)
jax.block_until_ready(tm["loss"])
print(f"C composed 3 steps: {time.perf_counter()-t0:.2f} s")

shutil.rmtree(media_dir, ignore_errors=True)
