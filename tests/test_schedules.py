import numpy as np
import pytest

from mm_diffusion_tpu.diffusion import (
    get_named_beta_schedule,
    make_schedule,
    respace_betas,
    space_timesteps,
    tables_from_betas,
)


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # T-invariance: scaled so a T=500 schedule covers the same range x2.
    betas500 = get_named_beta_schedule("linear", 500)
    assert betas500[0] == pytest.approx(2e-4)
    assert betas500[-1] == pytest.approx(0.04)


def test_cosine_schedule_bounds():
    betas = get_named_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # alpha_bar should decay monotonically.
    abar = np.cumprod(1 - betas)
    assert (np.diff(abar) < 0).all()


def test_tables_match_closed_forms():
    betas = get_named_beta_schedule("linear", 100)
    tb = tables_from_betas(betas)
    abar = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(tb.alphas_cumprod), abar, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tb.sqrt_alphas_cumprod), np.sqrt(abar), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tb.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - abar), rtol=1e-6
    )
    abar_prev = np.append(1.0, abar[:-1])
    post_var = betas * (1 - abar_prev) / (1 - abar)
    np.testing.assert_allclose(np.asarray(tb.posterior_variance), post_var, rtol=1e-5)
    # posterior mean coefficients sum context: coef1*x0 + coef2*xt with x0=xt=1, t=0
    # equals 1 (the posterior of a deterministic first step is the point itself).
    c1 = np.asarray(tb.posterior_mean_coef1)
    c2 = np.asarray(tb.posterior_mean_coef2)
    # identity: coef1 * sqrt(abar) + coef2 * ... for x_t drawn with zero noise:
    # q_posterior(x0, sqrt(abar)*x0) mean must be sqrt(abar_prev)*x0.
    np.testing.assert_allclose(
        c1 + c2 * np.sqrt(abar), np.sqrt(abar_prev), rtol=1e-5
    )


def test_space_timesteps_ddim():
    kept = space_timesteps(1000, "ddim25")
    assert len(kept) == 25
    assert kept == set(range(0, 1000, 40))


def test_space_timesteps_sections():
    kept = space_timesteps(300, [10, 15, 20])
    assert len(kept) == 45
    assert 0 in kept and max(kept) < 300


def test_respace_preserves_alpha_bar():
    betas = get_named_beta_schedule("linear", 1000)
    kept = space_timesteps(1000, "ddim25")
    new_betas, tmap = respace_betas(betas, kept)
    assert new_betas.shape == (25,) and tmap.shape == (25,)
    abar_full = np.cumprod(1 - betas)
    abar_new = np.cumprod(1 - new_betas)
    # alpha_bar at each kept step must be identical to the original process.
    np.testing.assert_allclose(abar_new, abar_full[tmap], rtol=1e-12)


def test_make_schedule_respaced_map():
    tb = make_schedule("linear", 1000, "ddim25")
    assert tb.num_timesteps == 25
    assert tb.original_num_steps == 1000
    assert tb.is_respaced
    import jax.numpy as jnp

    t = jnp.array([0, 24])
    mapped = np.asarray(tb.map_timesteps(t))
    assert mapped[0] == 0 and mapped[1] == 960


def test_make_schedule_identity_map():
    tb = make_schedule("linear", 100)
    assert not tb.is_respaced
    np.testing.assert_array_equal(np.asarray(tb.timestep_map), np.arange(100))
