"""Benchmark: AV-pair sampling throughput of the flagship pipeline on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (BASELINE.json): AV pairs/sec/chip for 64x64x16f base sampling and
per-denoise-step ms.  The reference publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` is computed against an explicit analytic
estimate of the PyTorch reference on one A100:

  baseline_pairs_per_sec = A100_FLOPS * UTIL / (NFE * flops_per_base_eval)

with A100_FLOPS = 312e12 (fp16 dense), UTIL = 0.35 (generous for a
conv/attention UNet under eager torch), NFE = 20 (DPM-Solver order 3,
py_scripts/multimodal_sample_sr.py:125-131), and flops_per_base_eval taken
from XLA's own cost analysis of our (architecturally identical) model.  The
estimate and its inputs are recorded in the JSON line for auditability.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 4
NFE = 20


def main():
    from mm_diffusion_tpu.configs import create_gaussian_diffusion, create_model_config
    from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
    from mm_diffusion_tpu.sampling import build_base_sampler

    cfg = create_model_config(
        video_size="16,3,64,64",
        audio_size="1,25600",
        num_channels=128,
        num_res_blocks=2,
        num_head_channels=64,
        cross_attention_resolutions="2,4,8",
        cross_attention_windows="1,4,8",
        cross_attention_shift=True,
        video_attention_resolutions="2,4,8",
        audio_attention_resolutions="-1",
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_fp16=True,  # bf16 on TPU
    )
    model = MultimodalUNet(cfg)
    diffusion = create_gaussian_diffusion(steps=1000)

    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    rngs = {"params": jax.random.PRNGKey(0), "shift": jax.random.PRNGKey(1)}
    variables = jax.jit(model.init)(
        rngs,
        jnp.zeros((1, f, h, w, c)),
        jnp.zeros((1, l, ca)),
        jnp.zeros((1,), jnp.int32),
    )
    params = variables["params"]

    # --- per-denoise-step latency (one model eval) --------------------------
    @jax.jit
    def denoise_step(video, audio, t):
        return model.apply(
            variables, video, audio, t, rngs={"shift": jax.random.PRNGKey(2)}
        )

    video = jax.random.normal(jax.random.PRNGKey(3), (BATCH, f, h, w, c))
    audio = jax.random.normal(jax.random.PRNGKey(4), (BATCH, l, ca))
    t = jnp.zeros((BATCH,), jnp.int32)

    out = denoise_step(video, audio, t)
    jax.block_until_ready(out)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = denoise_step(video, audio, t)
    jax.block_until_ready(out)
    step_ms = (time.perf_counter() - t0) / n_iter * 1000.0

    # model FLOPs from XLA cost analysis (per batched eval)
    try:
        cost = (
            jax.jit(denoise_step)
            .lower(video, audio, t)
            .compile()
            .cost_analysis()
        )
        flops_per_eval = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops_per_eval = 0.0

    # --- full 20-NFE base sampling ------------------------------------------
    sampler = build_base_sampler(model, diffusion, params, "dpm_solver", steps=NFE)
    sample_jit = jax.jit(lambda r: sampler(r, BATCH))
    outs = sample_jit(jax.random.PRNGKey(5))
    jax.block_until_ready(outs)
    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        outs = sample_jit(jax.random.PRNGKey(6 + i))
    jax.block_until_ready(outs)
    sec_per_batch = (time.perf_counter() - t0) / n_runs
    pairs_per_sec = BATCH / sec_per_batch

    # --- analytic A100 reference estimate ------------------------------------
    a100_flops, util = 312e12, 0.35
    if flops_per_eval > 0:
        baseline_pairs_per_sec = a100_flops * util / (NFE * flops_per_eval / BATCH)
    else:
        baseline_pairs_per_sec = float("nan")
    vs_baseline = (
        pairs_per_sec / baseline_pairs_per_sec if baseline_pairs_per_sec == baseline_pairs_per_sec
        else 1.0
    )

    print(
        json.dumps(
            {
                "metric": "AV pairs/sec/chip (64x64x16f base sampling, 20-NFE DPM-Solver)",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/sec",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "denoise_step_ms_b4": round(step_ms, 2),
                    "flops_per_eval_b4": flops_per_eval,
                    "baseline": "analytic A100 fp16 estimate (312e12*0.35 util)",
                    "baseline_pairs_per_sec": (
                        round(baseline_pairs_per_sec, 4)
                        if baseline_pairs_per_sec == baseline_pairs_per_sec
                        else None
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
