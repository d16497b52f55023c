"""Gaussian diffusion over arbitrary pytree states.

TPU-native re-design of the reference's *two* diffusion modules
(`mm_diffusion/multimodal_gaussian_diffusion.py` — dict-of-modalities — and
`mm_diffusion/gaussian_diffusion.py` — single tensor).  In the reference every
equation is hand-duplicated for video/audio (e.g. p_sample at
multimodal_gaussian_diffusion.py:415-474); here the state ``x`` is any JAX
pytree (a single array, or ``{"video": ..., "audio": ...}``) and each formula
is written once and mapped over the leaves.  A single shared timestep vector
``t`` of shape ``[B]`` drives all leaves, exactly as the reference shares one
``t`` per audio-video pair (multimodal_gaussian_diffusion.py:1114-1141).

Conventions (framework-wide):
  * channels-last layouts: video ``[B, F, H, W, C]``, audio ``[B, L, C]``.
  * model interface: ``model_fn(x_pytree, t_model) -> pytree`` with the same
    structure; when variance is learned each leaf has doubled channels on the
    last axis.
  * randomness is explicit: every stochastic method takes a PRNG key.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .schedules import ScheduleTables

PyTree = Any
ModelFn = Callable[[PyTree, jnp.ndarray], PyTree]


class ModelMeanType(enum.Enum):
    """What the model predicts (parity: multimodal_gaussian_diffusion.py:64-71)."""

    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    """How the reverse-process variance is obtained (ref :74-85)."""

    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


# ---------------------------------------------------------------------------
# Pytree utilities
# ---------------------------------------------------------------------------

def tree_randn_like(rng: jax.Array, x: PyTree) -> PyTree:
    """One independent standard-normal draw per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(x)
    keys = jax.random.split(rng, len(leaves))
    noise = [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, noise)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (parity: nn.py:159-163)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _bcast(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim-rank leaf
    (parity: _extract_into_tensor, multimodal_gaussian_diffusion.py:1289-1303)."""
    return table[t].reshape(t.shape + (1,) * (ndim - 1))


def _nonzero_mask(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return (t != 0).astype(jnp.float32).reshape(t.shape + (1,) * (ndim - 1))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (parity: losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to [-1,1] 8-bit bins
    (parity: losses.py:50-77)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


class GaussianDiffusion(struct.PyTreeNode):
    """Forward/reverse diffusion over pytree states.

    ``tables`` may be respaced; all sampler-facing methods take respaced
    timestep indices and internally map them through ``tables.timestep_map``
    before calling the model (folding the reference's ``_WrappedModel``).
    """

    tables: ScheduleTables
    mean_type: ModelMeanType = struct.field(pytree_node=False, default=ModelMeanType.EPSILON)
    var_type: ModelVarType = struct.field(pytree_node=False, default=ModelVarType.FIXED_LARGE)
    loss_type: LossType = struct.field(pytree_node=False, default=LossType.MSE)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)

    # -- model timestep mapping ------------------------------------------------
    @property
    def num_timesteps(self) -> int:
        return self.tables.num_timesteps

    def model_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Sampler step -> model timestep (respacing gather + optional rescale)."""
        mt = self.tables.map_timesteps(t)
        if self.rescale_timesteps:
            return mt.astype(jnp.float32) * (1000.0 / self.tables.original_num_steps)
        return mt

    # -- q(x_t | x_0) -----------------------------------------------------------
    def q_mean_variance(self, x_start: PyTree, t: jnp.ndarray):
        tb = self.tables
        mean = jax.tree.map(lambda l: _bcast(tb.sqrt_alphas_cumprod, t, l.ndim) * l, x_start)
        variance = jax.tree.map(
            lambda l: jnp.broadcast_to(1.0 - _bcast(tb.alphas_cumprod, t, l.ndim), l.shape),
            x_start,
        )
        log_variance = jax.tree.map(
            lambda l: jnp.broadcast_to(
                _bcast(tb.log_one_minus_alphas_cumprod, t, l.ndim), l.shape
            ),
            x_start,
        )
        return mean, variance, log_variance

    def q_sample(self, x_start: PyTree, t: jnp.ndarray, noise: PyTree) -> PyTree:
        """Sample q(x_t | x_0) (parity: multimodal_gaussian_diffusion.py:187-205)."""
        tb = self.tables
        return jax.tree.map(
            lambda l, n: _bcast(tb.sqrt_alphas_cumprod, t, l.ndim) * l
            + _bcast(tb.sqrt_one_minus_alphas_cumprod, t, l.ndim) * n,
            x_start,
            noise,
        )

    # -- q(x_{t-1} | x_t, x_0) ----------------------------------------------------
    def q_posterior_mean_variance(self, x_start: PyTree, x_t: PyTree, t: jnp.ndarray):
        tb = self.tables
        mean = jax.tree.map(
            lambda s, xt: _bcast(tb.posterior_mean_coef1, t, xt.ndim) * s
            + _bcast(tb.posterior_mean_coef2, t, xt.ndim) * xt,
            x_start,
            x_t,
        )
        variance = jax.tree.map(
            lambda xt: jnp.broadcast_to(_bcast(tb.posterior_variance, t, xt.ndim), xt.shape),
            x_t,
        )
        log_variance = jax.tree.map(
            lambda xt: jnp.broadcast_to(
                _bcast(tb.posterior_log_variance_clipped, t, xt.ndim), xt.shape
            ),
            x_t,
        )
        return mean, variance, log_variance

    # -- conversions ---------------------------------------------------------------
    def predict_xstart_from_eps(self, x_t: PyTree, t: jnp.ndarray, eps: PyTree) -> PyTree:
        tb = self.tables
        return jax.tree.map(
            lambda xt, e: _bcast(tb.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt
            - _bcast(tb.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * e,
            x_t,
            eps,
        )

    def predict_xstart_from_xprev(self, x_t: PyTree, t: jnp.ndarray, xprev: PyTree) -> PyTree:
        tb = self.tables
        return jax.tree.map(
            lambda xt, xp: _bcast(1.0 / tb.posterior_mean_coef1, t, xt.ndim) * xp
            - _bcast(tb.posterior_mean_coef2 / tb.posterior_mean_coef1, t, xt.ndim) * xt,
            x_t,
            xprev,
        )

    def predict_eps_from_xstart(self, x_t: PyTree, t: jnp.ndarray, xstart: PyTree) -> PyTree:
        tb = self.tables
        return jax.tree.map(
            lambda xt, x0: (
                _bcast(tb.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt - x0
            )
            / _bcast(tb.sqrt_recipm1_alphas_cumprod, t, xt.ndim),
            x_t,
            xstart,
        )

    # -- split learned variance -----------------------------------------------------
    def split_model_output(self, model_output: PyTree, x: PyTree):
        """Split each leaf into (mean-prediction, var-values) on the channel axis.

        Returns ``(model_output, var_values_or_None)``.  The reference splits
        video on dim=2 and audio on dim=1 (multimodal_gaussian_diffusion.py:278);
        channels-last makes both ``axis=-1``.
        """
        if self.var_type not in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            return model_output, None
        pairs = jax.tree.map(
            lambda mo, xt: tuple(jnp.split(mo, 2, axis=-1)), model_output, x
        )
        mean_part = jax.tree.map(lambda _, p: p[0], x, pairs)
        var_part = jax.tree.map(lambda _, p: p[1], x, pairs)
        return mean_part, var_part

    def model_variance(self, var_values: Optional[PyTree], x: PyTree, t: jnp.ndarray):
        """Per-leaf (variance, log_variance) from the configured var type
        (parity: multimodal_gaussian_diffusion.py:270-306)."""
        tb = self.tables
        if self.var_type == ModelVarType.LEARNED:
            log_variance = var_values
            variance = jax.tree.map(jnp.exp, log_variance)
        elif self.var_type == ModelVarType.LEARNED_RANGE:
            def interp(v, xt):
                min_log = _bcast(tb.posterior_log_variance_clipped, t, xt.ndim)
                max_log = _bcast(tb.log_betas, t, xt.ndim)
                frac = (v + 1.0) / 2.0
                return frac * max_log + (1.0 - frac) * min_log

            log_variance = jax.tree.map(interp, var_values, x)
            variance = jax.tree.map(jnp.exp, log_variance)
        elif self.var_type == ModelVarType.FIXED_LARGE:
            variance = jax.tree.map(
                lambda xt: jnp.broadcast_to(_bcast(tb.fixed_large_variance, t, xt.ndim), xt.shape), x
            )
            log_variance = jax.tree.map(
                lambda xt: jnp.broadcast_to(
                    _bcast(tb.fixed_large_log_variance, t, xt.ndim), xt.shape
                ),
                x,
            )
        elif self.var_type == ModelVarType.FIXED_SMALL:
            variance = jax.tree.map(
                lambda xt: jnp.broadcast_to(_bcast(tb.posterior_variance, t, xt.ndim), xt.shape), x
            )
            log_variance = jax.tree.map(
                lambda xt: jnp.broadcast_to(
                    _bcast(tb.posterior_log_variance_clipped, t, xt.ndim), xt.shape
                ),
                x,
            )
        else:
            raise NotImplementedError(self.var_type)
        return variance, log_variance

    # -- p(x_{t-1} | x_t) --------------------------------------------------------------
    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x: PyTree,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable[[PyTree], PyTree]] = None,
    ):
        """Reverse-process mean/variance + x0 prediction
        (parity: multimodal_gaussian_diffusion.py:231-343)."""
        model_output = model_fn(x, self.model_timesteps(t))
        mean_part, var_values = self.split_model_output(model_output, x)
        variance, log_variance = self.model_variance(var_values, x, t)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jax.tree.map(lambda l: jnp.clip(l, -1.0, 1.0), x0)
            return x0

        if self.mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self.predict_xstart_from_xprev(x, t, mean_part))
            mean = mean_part
        elif self.mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
            if self.mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(mean_part)
            else:
                pred_xstart = process_xstart(self.predict_xstart_from_eps(x, t, mean_part))
            mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:
            raise NotImplementedError(self.mean_type)

        return {
            "mean": mean,
            "variance": variance,
            "log_variance": log_variance,
            "pred_xstart": pred_xstart,
            "model_output": mean_part,
        }

    def p_sample(
        self,
        model_fn: ModelFn,
        x: PyTree,
        t: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
    ):
        """One ancestral sampling step (parity: multimodal_gaussian_diffusion.py:415-474)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t)
        noise = tree_randn_like(rng, x)
        sample = jax.tree.map(
            lambda m, lv, n: m + _nonzero_mask(t, m.ndim) * jnp.exp(0.5 * lv) * n,
            out["mean"],
            out["log_variance"],
            noise,
        )
        return {
            "sample": sample,
            "pred_xstart": out["pred_xstart"],
            "pred_noise": out["model_output"],
        }

    # -- guidance ------------------------------------------------------------------------
    def condition_mean(self, cond_fn, p_mean_var, x, t):
        """Sohl-Dickstein-style mean shift (parity: ref :376-389).

        ``cond_fn(x, t_model) -> grad`` pytree matching x.
        """
        gradient = cond_fn(x, self.model_timesteps(t))
        return jax.tree.map(
            lambda m, v, g: m + v * g, p_mean_var["mean"], p_mean_var["variance"], gradient
        )

    def condition_score(self, cond_fn, p_mean_var, x, t):
        """Song et al. score conditioning (parity: ref :391-413)."""
        tb = self.tables
        gradient = cond_fn(x, self.model_timesteps(t))
        eps = self.predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = jax.tree.map(
            lambda e, g, xt: e - jnp.sqrt(1.0 - _bcast(tb.alphas_cumprod, t, xt.ndim)) * g,
            eps,
            gradient,
            x,
        )
        out = dict(p_mean_var)
        out["pred_xstart"] = self.predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # -- DDIM ------------------------------------------------------------------------------
    def ddim_sample(
        self,
        model_fn: ModelFn,
        x: PyTree,
        t: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        eta: float = 0.0,
    ):
        """One DDIM step (parity: multimodal_gaussian_diffusion.py:821-901)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        tb = self.tables
        eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
        noise = tree_randn_like(rng, x)

        def step(x0, e, n, xt):
            abar = _bcast(tb.alphas_cumprod, t, xt.ndim)
            abar_prev = _bcast(tb.alphas_cumprod_prev, t, xt.ndim)
            sigma = (
                eta
                * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar))
                * jnp.sqrt(1.0 - abar / abar_prev)
            )
            mean_pred = x0 * jnp.sqrt(abar_prev) + jnp.sqrt(1.0 - abar_prev - sigma**2) * e
            return mean_pred + _nonzero_mask(t, xt.ndim) * sigma * n

        sample = jax.tree.map(step, out["pred_xstart"], eps, noise, x)
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x: PyTree,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn=None,
    ):
        """Deterministic DDIM encoding step x_t -> x_{t+1} (parity: ref :903-953)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        tb = self.tables

        def step(x0, xt):
            eps = (
                _bcast(tb.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt - x0
            ) / _bcast(tb.sqrt_recipm1_alphas_cumprod, t, xt.ndim)
            abar_next = _bcast(tb.alphas_cumprod_next, t, xt.ndim)
            return x0 * jnp.sqrt(abar_next) + jnp.sqrt(1.0 - abar_next) * eps

        sample = jax.tree.map(step, out["pred_xstart"], x)
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    # -- VLB & losses -----------------------------------------------------------------------
    def vb_terms_bpd(
        self,
        model_fn: ModelFn,
        x_start: PyTree,
        x_t: PyTree,
        t: jnp.ndarray,
        clip_denoised: bool = True,
    ):
        """Per-leaf variational bound term in bits/dim
        (parity: multimodal_gaussian_diffusion.py:1048-1092)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised)

        def term(xs, tm, tlv, m, lv):
            kl = mean_flat(normal_kl(tm, tlv, m, lv)) / jnp.log(2.0)
            decoder_nll = (
                mean_flat(-discretized_gaussian_log_likelihood(xs, means=m, log_scales=0.5 * lv))
                / jnp.log(2.0)
            )
            return jnp.where(t == 0, decoder_nll, kl)

        output = jax.tree.map(
            term, x_start, true_mean, true_log_var, out["mean"], out["log_variance"]
        )
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: PyTree,
        t: jnp.ndarray,
        rng: jax.Array,
        noise: Optional[PyTree] = None,
    ):
        """Training losses for one shared timestep batch
        (parity: multimodal_training_losses, ref :1114-1203; also covers the
        single-tensor training_losses of gaussian_diffusion.py:850).

        Returns ``{"loss": [B] total, "mse": pytree of [B], "vb": pytree of [B]
        (only when variance is learned)}``.
        """
        if noise is None:
            noise = tree_randn_like(rng, x_start)
        x_t = self.q_sample(x_start, t, noise)
        terms = {}

        if self.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
            model_output = model_fn(x_t, self.model_timesteps(t))
            mean_part, var_values = self.split_model_output(model_output, x_start)

            if var_values is not None:
                # Learn variance with the VLB but freeze the mean prediction
                # (stop_gradient) so it doesn't bias the MSE term (ref :1153-1167).
                frozen_out = jax.tree.map(
                    lambda mp, vv: jnp.concatenate([jax.lax.stop_gradient(mp), vv], axis=-1),
                    mean_part,
                    var_values,
                )
                vb = self.vb_terms_bpd(
                    model_fn=lambda *_: frozen_out,
                    x_start=x_start,
                    x_t=x_t,
                    t=t,
                    clip_denoised=False,
                )["output"]
                if self.loss_type == LossType.RESCALED_MSE:
                    vb = jax.tree.map(lambda v: v * (self.num_timesteps / 1000.0), vb)
                terms["vb"] = vb

            if self.mean_type == ModelMeanType.PREVIOUS_X:
                target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
            elif self.mean_type == ModelMeanType.START_X:
                target = x_start
            else:
                target = noise
            terms["mse"] = jax.tree.map(
                lambda tgt, mo: mean_flat((tgt - mo.astype(tgt.dtype)) ** 2), target, mean_part
            )
        elif self.loss_type.is_vb():
            vb = self.vb_terms_bpd(model_fn, x_start, x_t, t, clip_denoised=False)["output"]
            if self.loss_type == LossType.RESCALED_KL:
                vb = jax.tree.map(lambda v: v * self.num_timesteps, vb)
            terms["vb"] = vb
        else:
            raise NotImplementedError(self.loss_type)

        total = None
        for key in ("mse", "vb"):
            if key in terms:
                for leaf in jax.tree_util.tree_leaves(terms[key]):
                    total = leaf if total is None else total + leaf
        terms["loss"] = total
        return terms

    def prior_bpd(self, x_start: PyTree):
        """Prior KL in bits/dim per leaf (parity: ref :1213-1229)."""
        leaves = jax.tree_util.tree_leaves(x_start)
        b = leaves[0].shape[0]
        t = jnp.full((b,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_var = self.q_mean_variance(x_start, t)
        return jax.tree.map(
            lambda m, lv: mean_flat(normal_kl(m, lv, 0.0, 0.0)) / jnp.log(2.0),
            qt_mean,
            qt_log_var,
        )

    def calc_bpd_loop(
        self,
        model_fn: ModelFn,
        x_start: PyTree,
        rng: jax.Array,
        clip_denoised: bool = True,
    ):
        """Full-chain variational lower bound in bits/dim, per batch element
        (parity: multimodal_gaussian_diffusion.py:1231-1285 and
        gaussian_diffusion.py:953; the reference's Python loop over timesteps
        becomes one ``lax.scan``).

        Returns per-leaf pytrees: ``total_bpd``/``prior_bpd`` of shape ``[B]``
        and ``vb``/``xstart_mse``/``mse`` of shape ``[B, T]`` with column 0
        corresponding to ``t = T-1`` (the reference iterates t descending and
        stacks in that order).
        """
        leaves = jax.tree_util.tree_leaves(x_start)
        b = leaves[0].shape[0]
        num_t = self.num_timesteps
        ts = jnp.arange(num_t - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(rng, num_t)

        def body(_, inp):
            t_scalar, key = inp
            t = jnp.full((b,), t_scalar, dtype=jnp.int32)
            noise = tree_randn_like(key, x_start)
            x_t = self.q_sample(x_start, t, noise)
            out = self.vb_terms_bpd(model_fn, x_start, x_t, t, clip_denoised)
            xstart_mse = jax.tree.map(
                lambda xs, px: mean_flat((px - xs) ** 2), x_start, out["pred_xstart"]
            )
            eps = self.predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            mse = jax.tree.map(lambda e, n: mean_flat((e - n) ** 2), eps, noise)
            return None, {"vb": out["output"], "xstart_mse": xstart_mse, "mse": mse}

        _, seq = jax.lax.scan(body, None, (ts, keys))
        seq = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), seq)  # [T,B] -> [B,T]
        prior = self.prior_bpd(x_start)
        total = jax.tree.map(lambda v, p: v.sum(axis=1) + p, seq["vb"], prior)
        return {
            "total_bpd": total,
            "prior_bpd": prior,
            "vb": seq["vb"],
            "xstart_mse": seq["xstart_mse"],
            "mse": seq["mse"],
        }
