"""Multi-chip sampling compiles clean: no activation all-gathers (VERDICT r4 #5).

The >=5x multi-chip scaling argument (BASELINE.md) rests on data-sharded
sampling partitioning every batch-leading tensor with zero cross-device
traffic: replicated params + batch-sharded activations need no collectives
at all in the steady state.  The known failure mode is GSPMD falling back to
"all-gather the operand, run the op replicated, dynamic-slice the result"
around ops it cannot partition — exactly what the shard_mapped attention
kernels (ops/block_attention.py set_kernel_mesh) exist to prevent.

This compiles the REAL base+SR sampling program (the multimodal_sample_sr.py
n_sample_data>1 path) on the virtual 8-device mesh and audits the optimized
HLO: any all-gather / all-reduce / collective-permute touching a tensor of
meaningful size fails the test.  Tiny tensors are tolerated (GSPMD may emit
scalar bookkeeping collectives), activation-sized ones are the bug.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mm_diffusion_tpu import configs
from mm_diffusion_tpu.models.image_unet import ImageSuperResModel
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.ops.block_attention import set_kernel_mesh
from mm_diffusion_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicated
from mm_diffusion_tpu.sampling import (
    build_base_sampler,
    build_sr_sampler,
    sample_base_and_sr,
)

# collectives with operands at or above this many elements fail the audit
_MAX_COLLECTIVE_ELEMS = 4096

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all")


def _audit_collectives(hlo_text: str):
    """Return [(op, shape, elems)] for collectives over the size threshold.

    Optimized-HLO lines look like ``%name = bf16[8,4,16,16,3]{...} all-gather(...)``
    (possibly inside tuple shapes); every collective keyword on a line is
    charged with the largest array shape on that line.
    """
    bad = []
    for line in hlo_text.splitlines():
        op = next((c for c in _COLLECTIVES if f" {c}(" in line or f"{c}-start(" in line), None)
        if op is None:
            continue
        elems = 0
        shape = ""
        for dims in re.finditer(r"\[([\d,]+)\]", line.split("(")[0]):
            n = 1
            for d in dims.group(1).split(","):
                n *= int(d)
            if n > elems:
                elems, shape = n, dims.group(0)
        if elems >= _MAX_COLLECTIVE_ELEMS:
            bad.append((op, shape, elems))
    return bad


def _fake(model, rngs, *args):
    shapes = jax.eval_shape(model.init, rngs, *args)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)


@pytest.mark.slow
def test_data_sharded_sampling_hlo_no_activation_gathers():
    batch, frames, sr_size = 8, 4, 64
    cfg = configs.create_model_config(
        video_size=f"{frames},3,16,16", audio_size="1,1024", num_channels=32,
        num_res_blocks=1, cross_attention_resolutions="2,4",
        cross_attention_windows="1,2", cross_attention_shift=True,
        video_attention_resolutions="2,4", audio_attention_resolutions="-1",
        channel_mult="1,2", num_heads=2, use_scale_shift_norm=True,
    )
    model = MultimodalUNet(cfg)
    diffusion = configs.create_gaussian_diffusion(
        steps=100, timestep_respacing="ddim4"
    )
    sr_cfg = configs.create_image_sr_config(
        large_size=sr_size, small_size=16, sr_num_channels=32,
        sr_num_res_blocks=1, sr_attention_resolutions="8",
        sr_learn_sigma=True, sr_use_scale_shift_norm=True,
    )
    sr_model = ImageSuperResModel(sr_cfg)
    sr_diffusion = configs.create_gaussian_diffusion(
        steps=100, learn_sigma=True, timestep_respacing="ddim3"
    )

    mesh = make_mesh(n_data=8, n_fsdp=1)
    set_kernel_mesh(mesh)
    try:
        k = jax.random.PRNGKey(0)
        params = _fake(
            model, {"params": k, "shift": k},
            jnp.zeros((1, frames, 16, 16, 3)), jnp.zeros((1, 1024, 1)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        sr_params = _fake(
            sr_model, {"params": k},
            jnp.zeros((1, sr_size, sr_size, 3)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 16, 16, 3)),
        )["params"]
        params = jax.device_put(params, replicated(mesh))
        sr_params = jax.device_put(sr_params, replicated(mesh))

        base = build_base_sampler(model, diffusion, params, sample_fn="ddim", steps=4)
        sr = build_sr_sampler(sr_model, sr_diffusion, sr_params, sample_fn="ddim", steps=3)
        # sr_all_frames: the lax.map-over-clips layout all-gathers the sharded
        # batch (this test caught it); the batched layout stays sharded
        fn = lambda r: sample_base_and_sr(
            base, sr, r, batch, sr_size, frames, sr_all_frames=True
        )
        out_sh = NamedSharding(mesh, P(DATA_AXIS))
        lowered = jax.jit(fn, out_shardings=out_sh).lower(jax.random.PRNGKey(1))
        compiled = lowered.compile()
        hlo = compiled.as_text()

        bad = _audit_collectives(hlo)
        assert not bad, (
            "data-sharded sampling emitted activation-sized collectives "
            f"(GSPMD replication fallback): {bad[:8]}"
        )

        # and it actually runs, producing batch-sharded outputs
        out = compiled(jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        assert out["sr_video"].shape[0] == batch
        shard_devs = {d for s in out["sr_video"].addressable_shards for d in [s.device]}
        assert len(shard_devs) == 8, "output not sharded over the 8-device mesh"
        assert np.isfinite(np.asarray(jnp.mean(out["sr_video"], dtype=jnp.float32)))
    finally:
        set_kernel_mesh(None)
