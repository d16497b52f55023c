"""The published-weights conversion story (VERDICT r3 missing #3 / next #10).

Round-trips ``tools/convert_weights.py`` on a synthetic-random torch I3D
checkpoint: convert once to a native Orbax directory (with the sha256
manifest), then prove the torch-free load path returns bit-identical
parameters to the in-process torch import — so a user can convert the
published ``i3d_pretrained_400.pt`` / ``AudioCLIP-Full-Training.pt`` /
model-zoo ``.pt`` files with one command and never need torch again
(replaces evaluations/fvd/download.py's auto-download; recipe in
docs/WEIGHTS.md).

Also pins a synthetic end-to-end FVD fixture: deterministic fake "real" and
"generated" videos through the full preprocess -> I3D-embed -> Frechet
pipeline with seeded weights must reproduce a literal value, so a metric
regression (preprocessing, pooling, BN folding, Frechet algebra) can't hide.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _synthetic_i3d_pt(path: str, seed: int = 0):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_i3d_parity import _load_torch_i3d_module, _randomize_

    mod = _load_torch_i3d_module()
    model = mod.InceptionI3d(400, in_channels=3)
    _randomize_(model, seed=seed)
    torch.save(model.state_dict(), path)
    return model


def test_i3d_conversion_roundtrip(tmp_path):
    pt = str(tmp_path / "i3d_synthetic.pt")
    out = str(tmp_path / "i3d_native")
    _synthetic_i3d_pt(pt)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_weights.py"),
         "i3d", pt, out],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr

    with open(os.path.join(out, "CONVERSION.json")) as f:
        manifest = json.load(f)
    assert manifest["kind"] == "i3d"
    assert len(manifest["source_sha256"]) == 64
    assert manifest["census"]["n_params"] > 10_000_000  # full I3D-400

    from mm_diffusion_tpu.evaluation.i3d import load_i3d

    _, via_torch = load_i3d(pt)
    _, via_native = load_i3d(out)
    flat_t = jax.tree_util.tree_leaves_with_path(via_torch)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(via_native))
    assert len(flat_t) == len(flat_n)
    for path_key, arr in flat_t:
        np.testing.assert_array_equal(
            np.asarray(arr), np.asarray(flat_n[path_key]), err_msg=str(path_key)
        )


# pinned on the virtual-CPU mesh (fp32); re-pin DELIBERATELY if the
# protocol (preprocessing, I3D graph, Frechet algebra) intentionally changes
PINNED_EMBED_L1 = 0.0641895  # mean |embedding| of the seeded I3D on fixed clips
PINNED_FRECHET = 4.6808451  # frechet_distance on fixed synthetic features


@pytest.mark.slow
def test_fvd_pinned_fixture(tmp_path):
    """End-to-end FVD protocol guard, two pinned literals:

    1. the mean |embedding| of deterministic clips through a seeded I3D —
       any drift in uint8 scaling, the 224^2 resize, TF-SAME padding, BN
       folding, or the (2,7,7) pooling moves it;
    2. frechet_distance on fixed synthetic features — guards the Frechet
       algebra (trace-sqrt term included) independently of the embedder.

    (A randomly re-initialized I3D contracts all inputs toward one point, so
    a pinned end-to-end FVD between two clip sets would pin ~0.0 — the split
    pins cover the same code path with actual sensitivity.)
    """
    from mm_diffusion_tpu.evaluation.evaluator import make_i3d_embedder
    from mm_diffusion_tpu.evaluation.metrics import frechet_distance

    pt = str(tmp_path / "i3d_seeded.pt")
    _synthetic_i3d_pt(pt, seed=7)
    embed = make_i3d_embedder(pt)
    assert embed is not None

    rng = np.random.RandomState(123)
    real = rng.randint(0, 255, (8, 16, 64, 64, 3), np.uint8)
    e_real = embed(real)
    assert e_real.shape == (8, 400)
    l1 = float(np.abs(e_real).mean())
    assert abs(l1 - PINNED_EMBED_L1) / PINNED_EMBED_L1 < 5e-3, (
        f"I3D embedding drifted: mean|e| {l1} vs pinned {PINNED_EMBED_L1}"
    )

    feats_a = rng.standard_normal((64, 16)).astype(np.float64)
    feats_b = feats_a * 1.35 + 0.4 + rng.standard_normal((64, 16)) * 0.2
    fd = float(frechet_distance(feats_a, feats_b))
    assert abs(fd - PINNED_FRECHET) / PINNED_FRECHET < 1e-3, (
        f"Frechet algebra drifted: {fd} vs pinned {PINNED_FRECHET}"
    )
