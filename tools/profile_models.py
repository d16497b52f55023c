"""Profile the flagship base + SR model evals on the current backend.

Dumps (a) the per-op-category device-time breakdown and (b) the top-N
individual ops, from a jax.profiler xplane trace.  Used to drive the perf
work (VERDICT round-1 weak #2: ~86 ms/step of copies/converts).

Usage: python tools/profile_models.py [base|sr|both]
"""

from __future__ import annotations

import os
import sys
import tempfile

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

BATCH = int(os.environ.get("PROF_BATCH", "8"))
FRAMES = 16
SR_SIZE = 256


def fake_params(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)


def top_ops(trace_dir: str, top_n: int = 40):
    """Per-op device-time list [(name, total_ms, count)] from the xplane."""
    import glob as _glob
    from collections import Counter

    from mm_diffusion_tpu.utils.protos import xplane_pb2

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
    tot, cnt = Counter(), Counter()
    for line in lines:
        for ev in line.events:
            nm = ev_names.get(ev.metadata_id, "?")
            if nm.startswith("%while"):
                continue
            head = nm.split(" = ")[0].lstrip("%")
            tot[head] += ev.duration_ps
            cnt[head] += 1
    return [(k, ps / 1e9, cnt[k]) for k, ps in tot.most_common(top_n)]


def hlo_op_names(compiled_text: str):
    """fusion/op name -> model-level op_name metadata from optimized HLO."""
    import re

    mapping = {}
    for m in re.finditer(
        r"%([\w\.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", compiled_text
    ):
        mapping[m.group(1)] = m.group(2)
    return mapping


def profile_fn(tag, fn, args, n_iters=3):
    from mm_diffusion_tpu.utils.profiling import parse_trace

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        names = hlo_op_names(compiled.as_text())
    except Exception:
        names = {}
    out = compiled(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix=f"trace_{tag}_")
    jax.profiler.start_trace(tmp)
    for _ in range(n_iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    print(f"\n===== {tag}: categories (total over {n_iters} iters) =====")
    total = 0.0
    for cat, ms, n in parse_trace(tmp, top_n=25):
        total += ms
        print(f"{ms/n_iters:9.2f} ms  x{n:5d}  {cat}")
    print(f"{total/n_iters:9.2f} ms  TOTAL device time / iter")
    print(f"\n===== {tag}: top individual ops (joined to HLO op_name) =====")
    for name, ms, n in top_ops(tmp, top_n=int(os.environ.get("PROF_TOPN", "40"))):
        model_op = names.get(name, "")
        # strip the jit(fn)/Model/ prefix noise
        model_op = model_op.split("jit(fn)/")[-1][:90]
        print(f"{ms/n_iters:9.3f} ms  x{n:5d}  {name[:40]:42s} {model_op}")
    flt = os.environ.get("PROF_FILTER")
    if flt:
        print(f"\n===== {tag}: ops matching {flt!r} =====")
        for name, ms, n in top_ops(tmp, top_n=100000):
            if flt in name:
                model_op = names.get(name, "").split("jit(fn)/")[-1][:90]
                print(f"{ms/n_iters:9.3f} ms  x{n:5d}  {name[:40]:42s} {model_op}")


def build_base():
    from mm_diffusion_tpu.configs import create_model_config
    from mm_diffusion_tpu.models.mm_unet import MultimodalUNet

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

    def fn(v, a):
        vo, ao = model.apply(variables, v, a, t, rngs={"shift": jax.random.PRNGKey(2)})
        return vo.sum() + ao.sum()

    return fn, (video, audio)


def build_sr():
    from mm_diffusion_tpu.configs import create_image_sr_config
    from mm_diffusion_tpu.models.image_unet import ImageSuperResModel

    sr_cfg = create_image_sr_config(
        large_size=SR_SIZE, small_size=64, sr_num_channels=192, sr_num_res_blocks=2,
        sr_attention_resolutions="32,16,8", sr_learn_sigma=True,
        sr_num_head_channels=64, sr_use_scale_shift_norm=True,
        sr_resblock_updown=True, use_fp16=True,
    )
    sr_model = ImageSuperResModel(sr_cfg)
    sr_x = jax.random.normal(jax.random.PRNGKey(5), (FRAMES, SR_SIZE, SR_SIZE, 3))
    sr_low = jax.random.normal(jax.random.PRNGKey(6), (FRAMES, 64, 64, 3))
    sr_t = jnp.zeros((FRAMES,), jnp.int32)
    sr_vars = fake_params(
        sr_model, {"params": jax.random.PRNGKey(7)}, sr_x[:1], sr_t[:1], sr_low[:1]
    )

    def fn(x):
        out = sr_model.apply(sr_vars, x, sr_t, sr_low)
        return out.sum()

    return fn, (sr_x,)


def build_train():
    """Real-config training step (b4, remat) — the bench.py detail payload."""
    from mm_diffusion_tpu.configs import create_gaussian_diffusion, create_model_config
    from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
    from mm_diffusion_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

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
    TB = int(os.environ.get("PROF_TRAIN_BATCH", "4"))
    trng = jax.random.PRNGKey(0)
    tparams = jax.jit(tmodel.init, static_argnames=("train",))(
        {"params": trng, "shift": trng, "dropout": trng},
        jnp.zeros((1, 16, 64, 64, 3)), jnp.zeros((1, 25600, 1)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    ttx = make_optimizer(lr=1e-4)
    tstate = create_train_state(tparams, ttx, ema_rates=(0.9999,))
    tstep = make_train_step(tmodel, tdiff, ttx)
    tbatch = {
        "video": jax.random.normal(trng, (TB, 16, 64, 64, 3), jnp.float32),
        "audio": jax.random.normal(trng, (TB, 25600, 1), jnp.float32),
    }

    def fn(state, batch, rng):
        new_state, metrics = tstep(state, batch, rng)
        return metrics["loss"], new_state

    return fn, (tstate, tbatch, trng)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend(), jax.devices()[0])
    if which in ("base", "both"):
        fn, args = build_base()
        profile_fn("base_b8", fn, args)
    if which in ("sr", "both"):
        fn, args = build_sr()
        profile_fn("sr_16f_256", fn, args)
    if which == "train":
        fn, args = build_train()
        profile_fn("train_b4_remat", fn, args)
