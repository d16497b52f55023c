import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    make_schedule,
    tree_randn_like,
)


def mm_state(b=2, f=4, h=8, w=8, c=3, l=64, ca=1, key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {
        "video": jax.random.normal(k1, (b, f, h, w, c)),
        "audio": jax.random.normal(k2, (b, l, ca)),
    }


@pytest.fixture
def diff():
    return GaussianDiffusion(tables=make_schedule("linear", 100))


def test_q_sample_formula(diff):
    x0 = mm_state()
    noise = tree_randn_like(jax.random.PRNGKey(1), x0)
    t = jnp.array([0, 50])
    xt = diff.q_sample(x0, t, noise)
    abar = np.asarray(diff.tables.alphas_cumprod)
    for key in ("video", "audio"):
        for i, ti in enumerate([0, 50]):
            expect = np.sqrt(abar[ti]) * np.asarray(x0[key][i]) + np.sqrt(
                1 - abar[ti]
            ) * np.asarray(noise[key][i])
            np.testing.assert_allclose(np.asarray(xt[key][i]), expect, rtol=1e-4, atol=1e-5)


def test_eps_xstart_roundtrip(diff):
    """predict_xstart_from_eps inverts q_sample exactly."""
    x0 = mm_state()
    noise = tree_randn_like(jax.random.PRNGKey(1), x0)
    t = jnp.array([10, 77])
    xt = diff.q_sample(x0, t, noise)
    x0_hat = diff.predict_xstart_from_eps(xt, t, noise)
    for key in ("video", "audio"):
        np.testing.assert_allclose(np.asarray(x0_hat[key]), np.asarray(x0[key]), rtol=1e-3, atol=1e-4)
    eps_hat = diff.predict_eps_from_xstart(xt, t, x0)
    for key in ("video", "audio"):
        np.testing.assert_allclose(np.asarray(eps_hat[key]), np.asarray(noise[key]), rtol=1e-2, atol=1e-3)


def test_posterior_interpolates(diff):
    """Posterior mean of (x0, x_t=with zero noise) is sqrt(abar_prev)*x0."""
    x0 = mm_state()
    t = jnp.array([5, 60])
    zero_noise = jax.tree.map(jnp.zeros_like, x0)
    xt = diff.q_sample(x0, t, zero_noise)
    mean, var, logvar = diff.q_posterior_mean_variance(x0, xt, t)
    abar_prev = np.asarray(diff.tables.alphas_cumprod_prev)
    for key in ("video", "audio"):
        for i, ti in enumerate([5, 60]):
            np.testing.assert_allclose(
                np.asarray(mean[key][i]),
                np.sqrt(abar_prev[ti]) * np.asarray(x0[key][i]),
                rtol=1e-4,
                atol=1e-5,
            )
    np.testing.assert_allclose(np.asarray(var["video"]), np.exp(np.asarray(logvar["video"])), rtol=1e-4)


def test_perfect_eps_model_zero_mse(diff):
    """If the model returns the exact noise, MSE loss is ~0."""
    x0 = mm_state()
    rng = jax.random.PRNGKey(3)
    noise = tree_randn_like(jax.random.PRNGKey(4), x0)
    t = jnp.array([20, 80])

    def model_fn(x, t_model):
        return noise

    terms = diff.training_losses(model_fn, x0, t, rng, noise=noise)
    assert float(jnp.max(terms["loss"])) < 1e-8
    assert set(terms) == {"mse", "loss"}


def test_p_mean_variance_recovers_x0(diff):
    """With model = true eps, pred_xstart == x0 (before clipping)."""
    x0 = jax.tree.map(lambda a: jnp.clip(a, -0.9, 0.9), mm_state())
    noise = tree_randn_like(jax.random.PRNGKey(5), x0)
    t = jnp.array([30, 30])
    xt = diff.q_sample(x0, t, noise)

    out = diff.p_mean_variance(lambda x, tm: noise, xt, t, clip_denoised=False)
    for key in ("video", "audio"):
        np.testing.assert_allclose(
            np.asarray(out["pred_xstart"][key]), np.asarray(x0[key]), rtol=1e-2, atol=1e-3
        )


def test_learned_range_split_and_vb():
    diff = GaussianDiffusion(
        tables=make_schedule("linear", 100),
        var_type=ModelVarType.LEARNED_RANGE,
    )
    x0 = mm_state(c=3, ca=1)
    noise = tree_randn_like(jax.random.PRNGKey(6), x0)
    t = jnp.array([20, 80])

    def model_fn(x, tm):
        # predict true eps; var logits 0 => midpoint interpolation
        return jax.tree.map(
            lambda n: jnp.concatenate([n, jnp.zeros_like(n)], axis=-1), noise
        )

    terms = diff.training_losses(model_fn, x0, t, jax.random.PRNGKey(7), noise=noise)
    assert "vb" in terms and "mse" in terms
    assert float(jnp.max(terms["mse"]["video"])) < 1e-8
    assert np.all(np.isfinite(np.asarray(terms["loss"])))
    # total = sum of all leaf terms
    total = (
        terms["mse"]["video"]
        + terms["mse"]["audio"]
        + terms["vb"]["video"]
        + terms["vb"]["audio"]
    )
    np.testing.assert_allclose(np.asarray(terms["loss"]), np.asarray(total), rtol=1e-6)


def test_p_sample_t0_is_deterministic(diff):
    x0 = mm_state()
    noise = tree_randn_like(jax.random.PRNGKey(8), x0)
    t = jnp.array([0, 0])
    xt = diff.q_sample(x0, t, noise)
    out1 = diff.p_sample(lambda x, tm: noise, xt, t, jax.random.PRNGKey(1))
    out2 = diff.p_sample(lambda x, tm: noise, xt, t, jax.random.PRNGKey(2))
    # at t==0 the nonzero mask kills the noise: different rngs, same sample
    for key in ("video", "audio"):
        np.testing.assert_allclose(
            np.asarray(out1["sample"][key]), np.asarray(out2["sample"][key]), rtol=1e-6
        )


def test_ddim_deterministic_step(diff):
    x0 = jax.tree.map(lambda a: jnp.clip(a, -0.9, 0.9), mm_state())
    noise = tree_randn_like(jax.random.PRNGKey(9), x0)
    t = jnp.array([50, 50])
    xt = diff.q_sample(x0, t, noise)
    out = diff.ddim_sample(lambda x, tm: noise, xt, t, jax.random.PRNGKey(0), eta=0.0)
    # eta=0: x_{t-1} = sqrt(abar_prev)*x0 + sqrt(1-abar_prev)*eps
    abar_prev = float(diff.tables.alphas_cumprod_prev[50])
    for key in ("video", "audio"):
        expect = np.sqrt(abar_prev) * np.asarray(x0[key]) + np.sqrt(1 - abar_prev) * np.asarray(
            noise[key]
        )
        np.testing.assert_allclose(np.asarray(out["sample"][key]), expect, rtol=1e-2, atol=1e-3)


def test_single_tensor_state(diff):
    """The same implementation serves the single-tensor (image SR) process."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    t = jnp.array([10, 20])
    xt = diff.q_sample(x0, t, noise)
    assert xt.shape == x0.shape
    terms = diff.training_losses(lambda x, tm: noise, x0, t, jax.random.PRNGKey(2), noise=noise)
    assert float(jnp.max(terms["loss"])) < 1e-8


def test_vb_bounded_for_good_model(diff):
    x0 = jax.tree.map(lambda a: jnp.clip(a, -0.9, 0.9), mm_state())
    noise = tree_randn_like(jax.random.PRNGKey(10), x0)
    t = jnp.array([1, 50])
    xt = diff.q_sample(x0, t, noise)
    out = diff.vb_terms_bpd(lambda x, tm: noise, x0, xt, t)
    for key in ("video", "audio"):
        v = np.asarray(out["output"][key])
        assert np.all(np.isfinite(v))
        assert np.all(v < 1.0)  # near-perfect model => tiny KL in bits


def test_prior_bpd_small(diff):
    x0 = mm_state()
    prior = diff.prior_bpd(x0)
    for key in ("video", "audio"):
        assert float(jnp.max(prior[key])) < 1.0


def test_calc_bpd_loop_matches_per_step_terms():
    """The scanned full-chain NLL equals a hand loop over vb_terms_bpd with
    the same per-step keys (parity target:
    multimodal_gaussian_diffusion.py:1231-1285)."""
    num_t = 8
    diff = GaussianDiffusion(tables=make_schedule("cosine", num_t))
    x0 = jax.tree.map(lambda a: jnp.clip(a, -0.9, 0.9), mm_state(b=2, f=2, h=4, w=4, l=16))
    eps_model = tree_randn_like(jax.random.PRNGKey(11), x0)
    model_fn = lambda x, tm: eps_model

    rng = jax.random.PRNGKey(12)
    out = diff.calc_bpd_loop(model_fn, x0, rng)

    keys = jax.random.split(rng, num_t)
    b = 2
    for col, (t_scalar, key) in enumerate(zip(range(num_t - 1, -1, -1), keys)):
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        noise = tree_randn_like(key, x0)
        xt = diff.q_sample(x0, t, noise)
        ref = diff.vb_terms_bpd(model_fn, x0, xt, t)
        for mod in ("video", "audio"):
            np.testing.assert_allclose(
                np.asarray(out["vb"][mod][:, col]),
                np.asarray(ref["output"][mod]),
                rtol=1e-4,
                atol=1e-5,
            )
            eps_hat = diff.predict_eps_from_xstart(xt, t, ref["pred_xstart"])
            expect_mse = jnp.mean(
                (eps_hat[mod] - noise[mod]) ** 2, axis=tuple(range(1, noise[mod].ndim))
            )
            np.testing.assert_allclose(
                np.asarray(out["mse"][mod][:, col]), np.asarray(expect_mse), rtol=1e-4, atol=1e-5
            )
    # total = sum of vb columns + prior, per modality
    for mod in ("video", "audio"):
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"][mod]),
            np.asarray(out["vb"][mod].sum(axis=1) + out["prior_bpd"][mod]),
            rtol=1e-5,
        )
        assert out["vb"][mod].shape == (2, num_t)
        assert np.all(np.isfinite(np.asarray(out["total_bpd"][mod])))


def test_calc_bpd_loop_single_tensor():
    """Single-tensor states go through the same scan (gaussian_diffusion.py:953)."""
    diff = GaussianDiffusion(tables=make_schedule("cosine", 4))
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3)), -0.9, 0.9)
    out = diff.calc_bpd_loop(lambda x, tm: jnp.zeros_like(x), x0, jax.random.PRNGKey(1))
    assert out["vb"].shape == (2, 4)
    assert out["total_bpd"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(out["total_bpd"])))
