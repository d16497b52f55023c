"""DPM-Solver / DPM-Solver++ for pytree diffusion states.

TPU-native re-design of the reference's two solver modules
(`mm_diffusion/multimodal_dpm_solver_plus.py` — dict state — and
`mm_diffusion/dpm_solver_plus.py` — single tensor).  The reference duplicates
every update equation per modality (e.g. :559-588); here each update is
written once over pytree leaves, so the same solver serves the multimodal
base model and the single-tensor SR model.

Design notes (behavioral parity, TPU-friendly structure):
  * discrete-schedule interpolation (ref :104-180) uses ``jnp.interp`` over
    the monotone (t, log_alpha) tables instead of the reference's generic
    sort-based ``interpolate_fn`` — same piecewise-linear values on the
    sampling domain.
  * step times are scalars; all solver coefficients are scalar ops fused by
    XLA into the model launches.
  * ``singlestep``/``singlestep_fixed`` unroll (static order schedule,
    ref :480-524); ``multistep`` runs as ``lax.scan`` with a stacked model
    history (ref :1252-1276); ``adaptive`` is a ``lax.while_loop``
    (ref :1088-1149).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

PyTree = Any


_COSINE_S = 0.008
_COSINE_LOG_ALPHA_0 = math.log(math.cos(_COSINE_S / (1.0 + _COSINE_S) * math.pi / 2.0))


class NoiseScheduleVP(struct.PyTreeNode):
    """VP noise schedule in continuous time
    (parity: multimodal_dpm_solver_plus.py:11-190).

    Three branches, selected by the static ``schedule`` field:
      * ``"discrete"`` — ``t_i = (i+1)/N``; ``log_alpha(t)`` piecewise-linear
        over the (t, 0.5*log alphas_cumprod) grid (ref :108-119,:137-141).
      * ``"linear"``   — continuous-time DDPM VPSDE,
        ``log_alpha(t) = -t^2 (b1-b0)/4 - t b0/2`` with closed-form
        ``inverse_lambda`` (ref :142-143,:171-175).
      * ``"cosine"``   — improved-DDPM cosine schedule with ``T = 0.9946``
        and closed-form arccos inverse (ref :144-147,:180-184).
    """

    t_array: jnp.ndarray  # [N], increasing in (0, 1] (discrete branch)
    log_alpha_array: jnp.ndarray  # [N], 0.5*log(alphas_cumprod), decreasing
    total_N: int = struct.field(pytree_node=False)
    T: float = struct.field(pytree_node=False, default=1.0)
    schedule: str = struct.field(pytree_node=False, default="discrete")
    beta_0: float = struct.field(pytree_node=False, default=0.1)
    beta_1: float = struct.field(pytree_node=False, default=20.0)

    @classmethod
    def from_alphas_cumprod(cls, alphas_cumprod) -> "NoiseScheduleVP":
        abar = np.asarray(alphas_cumprod, dtype=np.float64)
        # guard against degenerate schedules (e.g. a very short linear
        # schedule reaches beta=1 => alpha_bar=0 => log(-inf))
        abar = np.clip(abar, 1e-12, 1.0)
        n = abar.shape[0]
        return cls(
            t_array=jnp.asarray(np.linspace(0.0, 1.0, n + 1)[1:], dtype=jnp.float32),
            log_alpha_array=jnp.asarray(0.5 * np.log(abar), dtype=jnp.float32),
            total_N=n,
        )

    @classmethod
    def from_betas(cls, betas) -> "NoiseScheduleVP":
        return cls.from_alphas_cumprod(np.cumprod(1.0 - np.asarray(betas, np.float64)))

    @classmethod
    def continuous(
        cls, schedule: str = "linear", beta_0: float = 0.1, beta_1: float = 20.0
    ) -> "NoiseScheduleVP":
        """Continuous-time VPSDE (ref :120-133: total_N=1000; cosine ends at
        T=0.9946 to dodge the arccos singularity)."""
        assert schedule in ("linear", "cosine"), schedule
        return cls(
            t_array=jnp.zeros((1,), jnp.float32),  # unused off the discrete branch
            log_alpha_array=jnp.zeros((1,), jnp.float32),
            total_N=1000,
            T=0.9946 if schedule == "cosine" else 1.0,
            schedule=schedule,
            beta_0=beta_0,
            beta_1=beta_1,
        )

    def marginal_log_mean_coeff(self, t):
        if self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        if self.schedule == "cosine":
            return (
                jnp.log(jnp.cos((t + _COSINE_S) / (1.0 + _COSINE_S) * math.pi / 2.0))
                - _COSINE_LOG_ALPHA_0
            )
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))
        return log_mean - log_std

    def inverse_lambda(self, lamb):
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * jnp.logaddexp(-2.0 * lamb, 0.0)
            delta = self.beta_0**2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        if self.schedule == "cosine":
            return (
                jnp.arccos(jnp.exp(log_alpha + _COSINE_LOG_ALPHA_0))
                * 2.0 * (1.0 + _COSINE_S) / math.pi
                - _COSINE_S
            )
        # log_alpha decreases in t; flip for increasing interp grid.
        return jnp.interp(log_alpha, self.log_alpha_array[::-1], self.t_array[::-1])


def model_input_time(ns: NoiseScheduleVP, t_continuous, rescale: bool = False):
    """Continuous t in [1/N, 1] -> model input time: the discrete timestep
    (int truncation) for discrete schedules, t itself for continuous ones
    (parity: ref :285-297)."""
    if ns.schedule != "discrete":
        return t_continuous
    max_step = 1000.0 if rescale else float(ns.total_N)
    return ((t_continuous - 1.0 / ns.total_N) * max_step).astype(jnp.int32)


def wrap_model(
    raw_model_fn: Callable[[PyTree, jnp.ndarray], PyTree],
    ns: NoiseScheduleVP,
    guidance_type: str = "uncond",
    guidance_scale: float = 1.0,
    condition=None,
    unconditional_condition=None,
    classifier_fn=None,
    rescale: bool = False,
) -> Callable[[PyTree, jnp.ndarray], PyTree]:
    """Wrap a discrete-time noise model into a continuous-time noise model
    (parity: model_wrapper, ref :183-370).

    ``raw_model_fn(x, t_discrete_int[B], cond=None) -> eps`` pytree matching x
    (learned-variance channels already stripped by the caller's adapter).
    """

    def batch_t(x, t_continuous):
        b = jax.tree_util.tree_leaves(x)[0].shape[0]
        return jnp.broadcast_to(jnp.atleast_1d(t_continuous), (b,))

    def noise_pred(x, t_continuous, cond=None):
        t_input = model_input_time(ns, t_continuous, rescale)
        if cond is None:
            return raw_model_fn(x, t_input)
        return raw_model_fn(x, t_input, cond)

    if guidance_type == "uncond":

        def model_fn(x, t_continuous):
            return noise_pred(x, batch_t(x, t_continuous))

    elif guidance_type == "classifier":
        assert classifier_fn is not None

        def model_fn(x, t_continuous):
            tb = batch_t(x, t_continuous)
            t_input = model_input_time(ns, tb, rescale)

            def log_prob(xx):
                return jnp.sum(classifier_fn(xx, t_input, condition))

            cond_grad = jax.grad(log_prob)(x)
            sigma_t = ns.marginal_std(tb)
            noise = noise_pred(x, tb)
            return jax.tree.map(
                lambda n_, g: n_
                - guidance_scale * sigma_t.reshape((-1,) + (1,) * (n_.ndim - 1)) * g,
                noise,
                cond_grad,
            )

    elif guidance_type == "classifier-free":

        def model_fn(x, t_continuous):
            tb = batch_t(x, t_continuous)
            if guidance_scale == 1.0 or unconditional_condition is None:
                return noise_pred(x, tb, cond=condition)
            x2 = jax.tree.map(lambda l: jnp.concatenate([l, l], axis=0), x)
            t2 = jnp.concatenate([tb, tb])
            c2 = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0),
                unconditional_condition,
                condition,
            )
            out = noise_pred(x2, t2, cond=c2)
            uncond = jax.tree.map(lambda l: l[: l.shape[0] // 2], out)
            cond_out = jax.tree.map(lambda l: l[l.shape[0] // 2 :], out)
            return jax.tree.map(
                lambda u, c: u + guidance_scale * (c - u), uncond, cond_out
            )

    else:
        raise ValueError(guidance_type)

    return model_fn


def _quantile_threshold(x0_leaf, p=0.995, max_val=1.0):
    """Imagen dynamic thresholding per sample (parity: ref :430-438)."""
    b = x0_leaf.shape[0]
    flat = jnp.abs(x0_leaf.reshape(b, -1))
    s = jnp.quantile(flat, p, axis=1)
    s = jnp.maximum(s, 1.0).reshape((b,) + (1,) * (x0_leaf.ndim - 1))
    return jnp.clip(x0_leaf, -s, s) / (s / max_val)


class DPMSolver:
    """DPM-Solver (noise prediction) / DPM-Solver++ (``predict_x0=True``)
    over pytree states (parity: DPM_Solver, ref :373-1298).

    ``model_fn(x, t_continuous) -> eps`` pytree (use :func:`wrap_model`).
    """

    def __init__(
        self,
        model_fn,
        ns: NoiseScheduleVP,
        predict_x0: bool = False,
        thresholding: bool = False,
        max_val: float = 1.0,
    ):
        self.model = model_fn
        self.ns = ns
        self.predict_x0 = predict_x0
        self.thresholding = thresholding
        self.max_val = max_val

    # -- model parameterisations --------------------------------------------------
    def noise_prediction_fn(self, x, t):
        return self.model(x, t)

    def data_prediction_fn(self, x, t):
        """x0 prediction with optional dynamic thresholding (ref :419-440)."""
        noise = self.noise_prediction_fn(x, t)
        alpha_t, sigma_t = self.ns.marginal_alpha(t), self.ns.marginal_std(t)
        x0 = jax.tree.map(lambda xt, n: (xt - sigma_t * n) / alpha_t, x, noise)
        if self.thresholding:
            x0 = jax.tree.map(lambda l: _quantile_threshold(l, max_val=self.max_val), x0)
        return x0

    def model_fn(self, x, t):
        return self.data_prediction_fn(x, t) if self.predict_x0 else self.noise_prediction_fn(x, t)

    # -- time grids ------------------------------------------------------------------
    def get_time_steps(self, skip_type, t_T, t_0, N):
        """(parity: ref :451-478)"""
        if skip_type == "logSNR":
            lambda_T = self.ns.marginal_lambda(jnp.asarray(t_T))
            lambda_0 = self.ns.marginal_lambda(jnp.asarray(t_0))
            logSNR_steps = jnp.linspace(lambda_T, lambda_0, N + 1)
            return self.ns.inverse_lambda(logSNR_steps)
        if skip_type == "time_uniform":
            return jnp.linspace(t_T, t_0, N + 1)
        if skip_type == "time_quadratic":
            return jnp.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
        raise ValueError(f"unsupported skip_type {skip_type}")

    @staticmethod
    def get_orders_for_singlestep_solver(steps, order):
        """DPM-Solver-fast order schedule (parity: ref :480-524)."""
        if order == 3:
            k = steps // 3 + 1
            if steps % 3 == 0:
                return [3] * (k - 2) + [2, 1]
            if steps % 3 == 1:
                return [3] * (k - 1) + [1]
            return [3] * (k - 1) + [2]
        if order == 2:
            k = steps // 2
            return [2] * k if steps % 2 == 0 else [2] * k + [1]
        if order == 1:
            return [1] * steps
        raise ValueError("order must be 1, 2 or 3")

    # -- updates ---------------------------------------------------------------------
    def _coeffs(self, t):
        ns = self.ns
        return ns.marginal_lambda(t), ns.marginal_log_mean_coeff(t), ns.marginal_std(t)

    def first_update(self, x, s, t, model_s=None):
        """DPM-Solver-1 / DDIM step (parity: ref :532-588)."""
        ns = self.ns
        lam_s, log_a_s, sig_s = self._coeffs(s)
        lam_t, log_a_t, sig_t = self._coeffs(t)
        h = lam_t - lam_s
        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.predict_x0:
            phi_1 = jnp.expm1(-h)
            alpha_t = jnp.exp(log_a_t)
            return jax.tree.map(
                lambda xs, ms: (sig_t / sig_s) * xs - (alpha_t * phi_1) * ms, x, model_s
            )
        phi_1 = jnp.expm1(h)
        return jax.tree.map(
            lambda xs, ms: jnp.exp(log_a_t - log_a_s) * xs - (sig_t * phi_1) * ms,
            x,
            model_s,
        )

    def singlestep_second_update(
        self, x, s, t, r1=0.5, model_s=None, return_intermediate=False,
        solver_type="dpm_solver",
    ):
        """Singlestep DPM-Solver-2 (parity: ref :590-704)."""
        if r1 is None:
            r1 = 0.5
        ns = self.ns
        lam_s, log_a_s, sig_s = self._coeffs(s)
        lam_t, log_a_t, sig_t = self._coeffs(t)
        h = lam_t - lam_s
        lam_s1 = lam_s + r1 * h
        s1 = ns.inverse_lambda(lam_s1)
        log_a_s1, sig_s1 = ns.marginal_log_mean_coeff(s1), ns.marginal_std(s1)
        alpha_s1, alpha_t = jnp.exp(log_a_s1), jnp.exp(log_a_t)

        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.predict_x0:
            phi_11, phi_1 = jnp.expm1(-r1 * h), jnp.expm1(-h)
            x_s1 = jax.tree.map(
                lambda xs, ms: (sig_s1 / sig_s) * xs - (alpha_s1 * phi_11) * ms, x, model_s
            )
            model_s1 = self.model_fn(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = jax.tree.map(
                    lambda xs, ms, ms1: (sig_t / sig_s) * xs
                    - (alpha_t * phi_1) * ms
                    - (0.5 / r1) * (alpha_t * phi_1) * (ms1 - ms),
                    x, model_s, model_s1,
                )
            else:  # taylor
                phi_2 = phi_1 / h + 1.0
                x_t = jax.tree.map(
                    lambda xs, ms, ms1: (sig_t / sig_s) * xs
                    - (alpha_t * phi_1) * ms
                    + (1.0 / r1) * (alpha_t * phi_2) * (ms1 - ms),
                    x, model_s, model_s1,
                )
        else:
            phi_11, phi_1 = jnp.expm1(r1 * h), jnp.expm1(h)
            x_s1 = jax.tree.map(
                lambda xs, ms: jnp.exp(log_a_s1 - log_a_s) * xs - (sig_s1 * phi_11) * ms,
                x, model_s,
            )
            model_s1 = self.model_fn(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = jax.tree.map(
                    lambda xs, ms, ms1: jnp.exp(log_a_t - log_a_s) * xs
                    - (sig_t * phi_1) * ms
                    - (0.5 / r1) * (sig_t * phi_1) * (ms1 - ms),
                    x, model_s, model_s1,
                )
            else:
                phi_2 = phi_1 / h - 1.0
                x_t = jax.tree.map(
                    lambda xs, ms, ms1: jnp.exp(log_a_t - log_a_s) * xs
                    - (sig_t * phi_1) * ms
                    - (1.0 / r1) * (sig_t * phi_2) * (ms1 - ms),
                    x, model_s, model_s1,
                )
        if return_intermediate:
            return x_t, {"model_s": model_s, "model_s1": model_s1}
        return x_t

    def singlestep_third_update(
        self, x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0, model_s=None, model_s1=None,
        return_intermediate=False, solver_type="dpm_solver",
    ):
        """Singlestep DPM-Solver-3 (parity: ref :706-887)."""
        if r1 is None:
            r1 = 1.0 / 3.0
        if r2 is None:
            r2 = 2.0 / 3.0
        ns = self.ns
        lam_s, log_a_s, sig_s = self._coeffs(s)
        lam_t, log_a_t, sig_t = self._coeffs(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        log_a_s1, sig_s1 = ns.marginal_log_mean_coeff(s1), ns.marginal_std(s1)
        log_a_s2, sig_s2 = ns.marginal_log_mean_coeff(s2), ns.marginal_std(s2)
        alpha_s1, alpha_s2, alpha_t = jnp.exp(log_a_s1), jnp.exp(log_a_s2), jnp.exp(log_a_t)

        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.predict_x0:
            phi_11, phi_12, phi_1 = jnp.expm1(-r1 * h), jnp.expm1(-r2 * h), jnp.expm1(-h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            if model_s1 is None:
                x_s1 = jax.tree.map(
                    lambda xs, ms: (sig_s1 / sig_s) * xs - (alpha_s1 * phi_11) * ms,
                    x, model_s,
                )
                model_s1 = self.model_fn(x_s1, s1)
            x_s2 = jax.tree.map(
                lambda xs, ms, ms1: (sig_s2 / sig_s) * xs
                - (alpha_s2 * phi_12) * ms
                + (r2 / r1) * (alpha_s2 * phi_22) * (ms1 - ms),
                x, model_s, model_s1,
            )
            model_s2 = self.model_fn(x_s2, s2)
            x_t = jax.tree.map(
                lambda xs, ms, ms2: (sig_t / sig_s) * xs
                - (alpha_t * phi_1) * ms
                + (1.0 / r2) * (alpha_t * phi_2) * (ms2 - ms),
                x, model_s, model_s2,
            )
        else:
            phi_11, phi_12, phi_1 = jnp.expm1(r1 * h), jnp.expm1(r2 * h), jnp.expm1(h)
            phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi_2 = phi_1 / h - 1.0
            if model_s1 is None:
                x_s1 = jax.tree.map(
                    lambda xs, ms: jnp.exp(log_a_s1 - log_a_s) * xs - (sig_s1 * phi_11) * ms,
                    x, model_s,
                )
                model_s1 = self.model_fn(x_s1, s1)
            x_s2 = jax.tree.map(
                lambda xs, ms, ms1: jnp.exp(log_a_s2 - log_a_s) * xs
                - (sig_s2 * phi_12) * ms
                - (r2 / r1) * (sig_s2 * phi_22) * (ms1 - ms),
                x, model_s, model_s1,
            )
            model_s2 = self.model_fn(x_s2, s2)
            x_t = jax.tree.map(
                lambda xs, ms, ms2: jnp.exp(log_a_t - log_a_s) * xs
                - (sig_t * phi_1) * ms
                - (1.0 / r2) * (sig_t * phi_2) * (ms2 - ms),
                x, model_s, model_s2,
            )
        if return_intermediate:
            return x_t, {"model_s": model_s, "model_s1": model_s1, "model_s2": model_s2}
        return x_t

    def singlestep_update(self, x, s, t, order, r1=None, r2=None, solver_type="dpm_solver",
                          return_intermediate=False):
        if order == 1:
            if return_intermediate:
                ms = self.model_fn(x, s)
                return self.first_update(x, s, t, model_s=ms), {"model_s": ms}
            return self.first_update(x, s, t)
        if order == 2:
            return self.singlestep_second_update(
                x, s, t, r1=r1, solver_type=solver_type, return_intermediate=return_intermediate
            )
        if order == 3:
            return self.singlestep_third_update(
                x, s, t, r1=r1, r2=r2, solver_type=solver_type,
                return_intermediate=return_intermediate,
            )
        raise ValueError(order)

    # -- multistep ---------------------------------------------------------------------
    def multistep_second_update(self, x, model_hist, t_hist, t, solver_type="dpm_solver"):
        """(parity: ref :889-968); model_hist leaves stacked [K>=2, ...],
        t_hist [K], most recent last."""
        ns = self.ns
        m0 = jax.tree.map(lambda l: l[-1], model_hist)
        m1 = jax.tree.map(lambda l: l[-2], model_hist)
        t0, t1 = t_hist[-1], t_hist[-2]
        lam_1, lam_0, lam_t = ns.marginal_lambda(t1), ns.marginal_lambda(t0), ns.marginal_lambda(t)
        log_a_0, log_a_t = ns.marginal_log_mean_coeff(t0), ns.marginal_log_mean_coeff(t)
        sig_0, sig_t = ns.marginal_std(t0), ns.marginal_std(t)
        alpha_t = jnp.exp(log_a_t)
        h0, h = lam_0 - lam_1, lam_t - lam_0
        r0 = h0 / h
        d1 = jax.tree.map(lambda a, b_: (1.0 / r0) * (a - b_), m0, m1)
        if self.predict_x0:
            if solver_type == "dpm_solver":
                return jax.tree.map(
                    lambda xs, m, d: (sig_t / sig_0) * xs
                    - alpha_t * jnp.expm1(-h) * m
                    - 0.5 * alpha_t * jnp.expm1(-h) * d,
                    x, m0, d1,
                )
            return jax.tree.map(
                lambda xs, m, d: (sig_t / sig_0) * xs
                - alpha_t * jnp.expm1(-h) * m
                + alpha_t * (jnp.expm1(-h) / h + 1.0) * d,
                x, m0, d1,
            )
        if solver_type == "dpm_solver":
            return jax.tree.map(
                lambda xs, m, d: jnp.exp(log_a_t - log_a_0) * xs
                - sig_t * jnp.expm1(h) * m
                - 0.5 * sig_t * jnp.expm1(h) * d,
                x, m0, d1,
            )
        return jax.tree.map(
            lambda xs, m, d: jnp.exp(log_a_t - log_a_0) * xs
            - sig_t * jnp.expm1(h) * m
            - sig_t * (jnp.expm1(h) / h - 1.0) * d,
            x, m0, d1,
        )

    def multistep_third_update(self, x, model_hist, t_hist, t, solver_type="dpm_solver"):
        """(parity: ref :970-1036)."""
        ns = self.ns
        m0 = jax.tree.map(lambda l: l[-1], model_hist)
        m1 = jax.tree.map(lambda l: l[-2], model_hist)
        m2 = jax.tree.map(lambda l: l[-3], model_hist)
        t0, t1, t2 = t_hist[-1], t_hist[-2], t_hist[-3]
        lam_2, lam_1, lam_0 = ns.marginal_lambda(t2), ns.marginal_lambda(t1), ns.marginal_lambda(t0)
        lam_t = ns.marginal_lambda(t)
        log_a_0, log_a_t = ns.marginal_log_mean_coeff(t0), ns.marginal_log_mean_coeff(t)
        sig_0, sig_t = ns.marginal_std(t0), ns.marginal_std(t)
        alpha_t = jnp.exp(log_a_t)
        h1, h0, h = lam_1 - lam_2, lam_0 - lam_1, lam_t - lam_0
        r0, r1 = h0 / h, h1 / h
        d1_0 = jax.tree.map(lambda a, b_: (1.0 / r0) * (a - b_), m0, m1)
        d1_1 = jax.tree.map(lambda a, b_: (1.0 / r1) * (a - b_), m1, m2)
        d1 = jax.tree.map(lambda a, b_: a + (r0 / (r0 + r1)) * (a - b_), d1_0, d1_1)
        d2 = jax.tree.map(lambda a, b_: (1.0 / (r0 + r1)) * (a - b_), d1_0, d1_1)
        if self.predict_x0:
            return jax.tree.map(
                lambda xs, m, da, db: (sig_t / sig_0) * xs
                - alpha_t * jnp.expm1(-h) * m
                + alpha_t * (jnp.expm1(-h) / h + 1.0) * da
                - alpha_t * ((jnp.expm1(-h) + h) / h**2 - 0.5) * db,
                x, m0, d1, d2,
            )
        return jax.tree.map(
            lambda xs, m, da, db: jnp.exp(log_a_t - log_a_0) * xs
            - sig_t * jnp.expm1(h) * m
            - sig_t * (jnp.expm1(h) / h - 1.0) * da
            - sig_t * ((jnp.expm1(h) - h) / h**2 - 0.5) * db,
            x, m0, d1, d2,
        )

    def multistep_update(self, x, model_hist, t_hist, t, order, solver_type="dpm_solver"):
        if order == 1:
            m0 = jax.tree.map(lambda l: l[-1], model_hist)
            return self.first_update(x, t_hist[-1], t, model_s=m0)
        if order == 2:
            return self.multistep_second_update(x, model_hist, t_hist, t, solver_type)
        if order == 3:
            return self.multistep_third_update(x, model_hist, t_hist, t, solver_type)
        raise ValueError(order)

    # -- adaptive -----------------------------------------------------------------------
    def adaptive(self, x, order, t_T, t_0, h_init=0.05, atol=0.0078, rtol=0.05,
                 theta=0.9, t_err=1e-5, solver_type="dpm_solver", max_iters=200):
        """Adaptive step-size solver as a lax.while_loop (parity: ref :1088-1149)."""
        ns = self.ns
        if order == 2:
            r1 = 0.5
            lower = lambda xx, s, t: self.singlestep_update(
                xx, s, t, 1, return_intermediate=True
            )
            higher = lambda xx, s, t, kw: self.singlestep_second_update(
                xx, s, t, r1=r1, solver_type=solver_type, model_s=kw["model_s"]
            )
        elif order == 3:
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            lower = lambda xx, s, t: self.singlestep_second_update(
                xx, s, t, r1=r1, return_intermediate=True, solver_type=solver_type
            )
            higher = lambda xx, s, t, kw: self.singlestep_third_update(
                xx, s, t, r1=r1, r2=r2, solver_type=solver_type,
                model_s=kw["model_s"], model_s1=kw["model_s1"],
            )
        else:
            raise ValueError("adaptive solver order must be 2 or 3")

        lambda_0 = ns.marginal_lambda(jnp.asarray(t_0))

        def norm_fn(v):
            b = v.shape[0]
            return jnp.sqrt(jnp.mean(jnp.square(v.reshape(b, -1)), axis=-1))

        def cond(carry):
            x, x_prev, s, h, it = carry
            return jnp.logical_and(jnp.abs(s - t_0) > t_err, it < max_iters)

        def body(carry):
            x, x_prev, s, h, it = carry
            lam_s = ns.marginal_lambda(s)
            t = ns.inverse_lambda(lam_s + h)
            x_lower, kw = lower(x, s, t)
            x_higher = higher(x, s, t, kw)
            errs = jax.tree.map(
                lambda lo, hi, pr: jnp.max(
                    norm_fn((hi - lo) / jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(lo), jnp.abs(pr))))
                ),
                x_lower, x_higher, x_prev,
            )
            e = jnp.max(jnp.stack(jax.tree_util.tree_leaves(errs)))
            accept = e <= 1.0
            x_new = jax.tree.map(
                lambda hi, old: jnp.where(accept, hi, old), x_higher, x
            )
            x_prev_new = jax.tree.map(
                lambda lo, old: jnp.where(accept, lo, old), x_lower, x_prev
            )
            s_new = jnp.where(accept, t, s)
            lam_new = ns.marginal_lambda(s_new)
            h_new = jnp.minimum(theta * h * e ** (-1.0 / order), lambda_0 - lam_new)
            return (x_new, x_prev_new, s_new, h_new, it + 1)

        s0 = jnp.asarray(t_T, jnp.float32)
        h0 = jnp.asarray(h_init, jnp.float32)
        x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, x, s0, h0, jnp.int32(0)))
        return x

    # -- driver -------------------------------------------------------------------------
    def sample(
        self,
        x: PyTree,
        steps: int = 20,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        order: int = 3,
        skip_type: str = "time_uniform",
        method: str = "singlestep",
        denoise: bool = False,
        solver_type: str = "dpm_solver",
        atol: float = 0.0078,
        rtol: float = 0.05,
    ) -> PyTree:
        """Sample from t_start (default T) to t_end (default 1/N)
        (parity: ref :1151-1298)."""
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start

        if method == "adaptive":
            x = self.adaptive(x, order=order, t_T=t_T, t_0=t_0, atol=atol, rtol=rtol,
                              solver_type=solver_type)
        elif method == "multistep":
            assert steps >= order
            ts = self.get_time_steps(skip_type, t_T, t_0, steps)
            # init: lower-order warmup (unrolled; parity ref :1256-1265)
            model_hist = jax.tree.map(lambda l: l[None], self.model_fn(x, ts[0]))
            t_hist = ts[0][None]
            for init_order in range(1, order):
                x = self.multistep_update(
                    x, model_hist, t_hist, ts[init_order], init_order, solver_type
                )
                model_hist = jax.tree.map(
                    lambda h, m: jnp.concatenate([h, m[None]], axis=0),
                    model_hist,
                    self.model_fn(x, ts[init_order]),
                )
                t_hist = jnp.concatenate([t_hist, ts[init_order][None]])

            def body(carry, step_idx):
                x, model_hist, t_hist = carry
                t = ts[step_idx]
                x = self.multistep_update(x, model_hist, t_hist, t, order, solver_type)
                t_hist = jnp.concatenate([t_hist[1:], t[None]])

                def with_eval(_):
                    m = self.model_fn(x, t)
                    return jax.tree.map(
                        lambda h, mm: jnp.concatenate([h[1:], mm[None]], axis=0),
                        model_hist, m,
                    )

                def without_eval(_):
                    return jax.tree.map(
                        lambda h: jnp.concatenate([h[1:], h[-1:]], axis=0), model_hist
                    )

                model_hist = jax.lax.cond(step_idx < steps, with_eval, without_eval, None)
                return (x, model_hist, t_hist), None

            (x, _, _), _ = jax.lax.scan(
                body, (x, model_hist, t_hist), jnp.arange(order, steps + 1)
            )
        elif method in ("singlestep", "singlestep_fixed"):
            if method == "singlestep":
                orders = self.get_orders_for_singlestep_solver(steps, order)
                ts = self.get_time_steps(skip_type, t_T, t_0, steps)
            else:
                k = steps // order
                orders = [order] * k
                ts = self.get_time_steps(skip_type, t_T, t_0, k * order)
            lambdas = self.ns.marginal_lambda(ts)
            i = 0
            for o in orders:
                s_t, e_t = ts[i], ts[i + o]
                h = lambdas[i + o] - lambdas[i]
                r1 = None if o <= 1 else (lambdas[i + 1] - lambdas[i]) / h
                r2 = None if o <= 2 else (lambdas[i + 2] - lambdas[i]) / h
                x = self.singlestep_update(x, s_t, e_t, o, r1=r1, r2=r2, solver_type=solver_type)
                i += o
        else:
            raise ValueError(method)

        if denoise:
            x = self.data_prediction_fn(x, jnp.asarray(t_0))
        return x
