"""Gaussian V-diffusion process — TPU-native re-design of reference
``v_diffusion/diffusion.py:260-576``.

Architecture stance (functional core):

* The reference's ``GaussianDiffusion`` is already nearly stateless; here it is
  a frozen hyperparameter container whose methods are pure functions of
  (tensors, rng keys) — directly jittable.
* **Sampling runs as a single jitted ``lax.scan``** over the step index with
  the denoiser weights closed over, so the full denoising trajectory stays
  on-chip in HBM (north star). All per-step schedule/posterior scalars are
  precomputed host-side in **numpy float64** — matching the reference's f64
  fidelity (diffusion.py:53,102,131,171) without any device fp64, which TPUs
  lack — and fed to the scan as (T,)-tables.
* **CFG batch-doubling uses concatenated halves** ([cond; uncond]) instead of
  the reference's stride-2 interleave (diffusion.py:30-39,369-372): a static
  concat/split is layout-friendly on TPU while computing identical math.
* Training loss is computed on-device in f32 with log-space-stable
  formulations (validated against the f64 host path in tests).

RNG: explicit ``jax.random`` keys; noise for sampling step ``ti`` is drawn
from ``fold_in(key, ti)``, replacing the reference's stateful torch Generator.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops import numerics as N


def _bcast(arr, ndim):
    return jnp.reshape(arr, (-1,) + (1,) * (ndim - 1))


@dataclass(frozen=True)
class GaussianDiffusion:
    """Hyperparameters of the diffusion process (reference diffusion.py:260-291).

    ``logsnr_fn`` is a pure schedule from :func:`vdiff_tpu.ops.numerics.
    get_logsnr_schedule`: ``fn(t) -> (logsnr, t_adjusted)``.
    """

    logsnr_fn: Callable = field(hash=False)
    sample_timesteps: int = 256
    model_out_type: str = "eps"  # x0 | eps | both | v
    model_var_type: str = "fixed_large"  # fixed_large | fixed_small | fixed_medium | learned
    reweight_type: str = "snr"  # constant | snr | snr_trunc | snr_1plus
    loss_type: str = "mse"  # mse | kl
    intp_frac: Optional[float] = None
    w_guide: float = 0.1
    p_uncond: float = 0.1
    x0eps_coef: bool = False

    # ------------------------------------------------------------------
    # schedule helpers
    # ------------------------------------------------------------------

    def t2logsnr(self, t, ndim: int = 4):
        """Device path: (B,) t → ((B,1,..) logsnr, (B,) adjusted t)."""
        logsnr, t_adj = self.logsnr_fn(t)
        return _bcast(logsnr, ndim), t_adj

    # ------------------------------------------------------------------
    # prediction conversions (dispatch on model_out_type)
    # ------------------------------------------------------------------

    def pred_x0(self, model_out, x_t, logsnr_t):
        """model output → x̂_0 (reference p_mean_var dispatch, diffusion.py:329-334)."""
        if self.model_out_type == "x0":
            return model_out
        if self.model_out_type == "eps":
            return N.pred_x0_from_eps(x_t, model_out, logsnr_t)
        if self.model_out_type == "both":
            return N.pred_x0_from_x0eps(x_t, model_out, logsnr_t)
        if self.model_out_type == "v":
            return N.pred_x0_from_v(x_t, model_out, logsnr_t)
        raise NotImplementedError(self.model_out_type)

    def from_model_out_to_pred(self, x_t, model_out, logsnr_t):
        """Derive {x_0, eps, (x_0, eps), v} from any head type (diffusion.py:466-490)."""
        assert self.model_out_type in {"x0", "eps", "both", "v"}
        if self.model_out_type == "v":
            v = model_out
            x_0 = N.pred_x0_from_v(x_t, v, logsnr_t)
            eps = N.pred_eps_from_v(x_t, v, logsnr_t)
        else:
            if self.model_out_type == "x0":
                x_0 = model_out
                eps = N.pred_eps_from_x0(x_t, x_0, logsnr_t)
            elif self.model_out_type == "eps":
                eps = model_out
                x_0 = N.pred_x0_from_eps(x_t, eps, logsnr_t)
            else:  # both
                x_0 = N.pred_x0_from_x0eps(x_t, model_out, logsnr_t)
                eps = N.pred_eps_from_x0(x_t, x_0, logsnr_t)
            v = N.pred_v_from_x0eps(x_0, eps, logsnr_t)
        return {"constant": x_0, "snr": eps, "snr_trunc": (x_0, eps), "snr_1plus": v}

    # ------------------------------------------------------------------
    # training loss (reference diffusion.py:492-545)
    # ------------------------------------------------------------------

    def train_loss(self, denoise_fn, x_0, t, y, noise, uncond_rng=None):
        """Per-sample loss vector of shape (B,).

        ``uncond_rng`` drives the in-loss CFG label dropout (diffusion.py:527-529);
        pass None to disable (e.g. when y is None).
        """
        ndim = x_0.ndim

        s = None
        if self.loss_type == "kl":
            T = self.sample_timesteps
            t = jnp.ceil(t * T) / T
            s = jnp.clip(t - 1.0 / T, 0.0, None)
            use_kl = s != 0

        logsnr_t, t_adj = self.t2logsnr(t, ndim)
        x_t = N.q_sample(x_0, logsnr_t, noise)

        if self.p_uncond and y is not None and uncond_rng is not None:
            keep = jax.random.uniform(uncond_rng, (y.shape[0],)) > self.p_uncond
            y = y * _bcast(keep.astype(y.dtype), y.ndim)

        model_out = denoise_fn(x_t, t_adj, y)

        if self.loss_type == "kl":
            logsnr_s, _ = self.t2logsnr(s, ndim)
            kl, nll, _ = self._loss_term_bpd(
                model_out, x_0=x_0, x_t=x_t, logsnr_s=logsnr_s, logsnr_t=logsnr_t,
                clip_denoised=False,
            )
            return jnp.where(use_kl, kl, nll)

        if self.loss_type == "mse":
            assert self.model_var_type != "learned"
            assert self.reweight_type in {"constant", "snr", "snr_trunc", "snr_1plus"}
            target = {
                "constant": x_0,
                "snr": noise,
                "snr_trunc": (x_0, noise),
                "snr_1plus": N.pred_v_from_x0eps(x_0, noise, logsnr_t),
            }[self.reweight_type]

            if isinstance(target, tuple):
                predict = self.from_model_out_to_pred(x_t, model_out, logsnr_t)[
                    self.reweight_type
                ]
                # snr_trunc: elementwise max over the two flat-mean MSEs
                # (diffusion.py:535-539)
                return jnp.maximum(
                    *[N.flat_mean((tgt - pred) ** 2) for tgt, pred in zip(target, predict)]
                )
            # non-tuple targets compare against the RAW model_out
            # (diffusion.py:541) — model_out_type must pair with reweight_type
            return N.flat_mean((target - model_out) ** 2)

        raise NotImplementedError(self.loss_type)

    # ------------------------------------------------------------------
    # posterior / p_mean_var on device (for kl loss + bpd evaluation)
    # ------------------------------------------------------------------

    def q_posterior_mean_var(self, x_0, x_t, logsnr_s, logsnr_t, model_var_type=None, intp_frac=None):
        model_var_type = model_var_type or self.model_var_type
        if intp_frac is None:
            intp_frac = self.intp_frac
        coefs = N.logsnr_to_posterior(
            logsnr_s, logsnr_t, var_type=model_var_type, intp_frac=intp_frac,
            x0eps_coef=self.x0eps_coef,
        )
        return coefs.mean_coef1 * x_t + coefs.mean_coef2 * x_0, coefs.logvar

    def q_posterior_mean_var_ddim(self, x_0, x_t, logsnr_s, logsnr_t):
        """Deterministic (η=0) DDIM posterior (reference diffusion.py:310-315)."""
        coefs = N.logsnr_to_posterior_ddim(
            logsnr_s, logsnr_t, eta=0.0, x0eps_coef=self.x0eps_coef
        )
        return coefs.mean_coef1 * x_t + coefs.mean_coef2 * x_0, coefs.logvar

    def p_mean_var(self, model_out, x_t, logsnr_s, logsnr_t, clip_denoised, use_ddim=False):
        """Device-path posterior from a model output (diffusion.py:317-356)."""
        intp_frac = None
        if self.model_var_type == "learned":
            model_out, frac_raw = jnp.split(model_out, 2, axis=-1)
            intp_frac = jax.nn.sigmoid(frac_raw)

        pred_x_0 = self.pred_x0(model_out, x_t, logsnr_t)
        if clip_denoised:
            pred_x_0 = jnp.clip(pred_x_0, -1.0, 1.0)

        if self.x0eps_coef:
            if clip_denoised or self.model_out_type != "eps":
                eps = N.pred_eps_from_x0(x_t, pred_x_0, logsnr_t)
            else:
                eps = model_out
            x_t = eps

        if use_ddim:
            coefs = N.logsnr_to_posterior_ddim(logsnr_s, logsnr_t, eta=0.0, x0eps_coef=self.x0eps_coef)
            mean = coefs.mean_coef1 * x_t + coefs.mean_coef2 * pred_x_0
            logvar = coefs.logvar
        else:
            mean, logvar = self.q_posterior_mean_var(
                pred_x_0, x_t, logsnr_s, logsnr_t,
                model_var_type="fixed_medium" if intp_frac is not None else None,
                intp_frac=intp_frac,
            )
        return mean, logvar, pred_x_0

    # ------------------------------------------------------------------
    # sampling — host-precomputed f64 step tables + one lax.scan
    # ------------------------------------------------------------------

    def sample_tables(self, use_ddim: bool = False, eta: float = 0.0):
        """Precompute per-step scalars in numpy float64 (host), f32 on device.

        Row ``i`` of each table corresponds to reverse step ``ti = T-1-i`` so a
        forward scan walks t from 1 → 0. ``eta`` selects the DDIM noise level
        (reference diffusion.py:169-203): 0 = deterministic, 1 ≡ ancestral
        fixed_small, 0<η<1 the general interpolation; ignored when
        ``use_ddim`` is False (matching the reference, whose ancestral branch
        never sees eta).
        """
        T = self.sample_timesteps
        ti = np.arange(T - 1, -1, -1, dtype=np.float64)  # T-1 .. 0
        s = ti / T
        t = (ti + 1.0) / T
        logsnr_s, _ = self.logsnr_fn(s)
        logsnr_t, model_t = self.logsnr_fn(t)

        if use_ddim:
            coefs = N.logsnr_to_posterior_ddim(logsnr_s, logsnr_t, eta=eta, x0eps_coef=self.x0eps_coef)
        else:
            var_type = self.model_var_type
            intp = self.intp_frac
            if var_type == "learned":
                var_type = "fixed_medium"
                intp = 0.5  # placeholder; learned path lerps on device
            coefs = N.logsnr_to_posterior(
                logsnr_s, logsnr_t, var_type=var_type, intp_frac=intp,
                x0eps_coef=self.x0eps_coef,
            )
        small = N.logsnr_to_posterior(logsnr_s, logsnr_t, "fixed_small")
        large = N.logsnr_to_posterior(logsnr_s, logsnr_t, "fixed_large")

        with np.errstate(over="ignore"):  # exp(-inf) -> 0 for ddim
            sigma = np.exp(0.5 * coefs.logvar.astype(np.float64)).astype(np.float32)

        f32 = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32))
        return {
            "model_t": f32(model_t),
            "logsnr_s": f32(logsnr_s),
            "logsnr_t": f32(logsnr_t),
            "mean_coef1": f32(coefs.mean_coef1),
            "mean_coef2": f32(coefs.mean_coef2),
            "sigma": f32(sigma),
            "logvar_min": f32(small.logvar),
            "logvar_max": f32(large.logvar),
            "nonzero": f32(ti > 0),
        }

    def _p_sample_step(self, denoise_fn, x_t, row, y, noise, clip_denoised=True, use_ddim=False):
        """One reverse step from a table row; CFG via concat doubling
        (reference p_sample_step, diffusion.py:360-392).

        ``use_ddim`` must match the flag the tables were built with: the DDIM
        (η=0) posterior is deterministic even for learned-variance models (the
        reference's p_mean_var DDIM branch ignores intp_frac), so the learned
        sigma interpolation is skipped there. ``noise=None`` statically skips
        the noise term (DDIM η=0: sigma ≡ 0, so callers avoid generating a
        full-shape normal draw per step that XLA cannot DCE)."""
        B = x_t.shape[0]
        ndim = x_t.ndim
        use_cfg = (self.w_guide > 0) and (y is not None)

        if use_cfg:
            x_in = jnp.concatenate([x_t, x_t], axis=0)
            y_in = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
        else:
            x_in, y_in = x_t, y

        t_in = jnp.full((x_in.shape[0],), row["model_t"], x_t.dtype)
        model_out = denoise_fn(x_in, t_in, y_in)

        intp_frac = None
        if self.model_var_type == "learned":
            model_out, frac_raw = jnp.split(model_out, 2, axis=-1)
            intp_frac = jax.nn.sigmoid(frac_raw)

        logsnr_t = row["logsnr_t"]
        pred_x_0 = self.pred_x0(model_out, x_in, logsnr_t)
        if clip_denoised:
            pred_x_0 = jnp.clip(pred_x_0, -1.0, 1.0)

        base = x_in
        if self.x0eps_coef:
            if clip_denoised or self.model_out_type != "eps":
                base = N.pred_eps_from_x0(x_in, pred_x_0, logsnr_t)
            else:
                base = model_out

        mean = row["mean_coef1"] * base + row["mean_coef2"] * pred_x_0
        sigma = row["sigma"]
        if intp_frac is not None and use_ddim:
            intp_frac = None  # DDIM posterior is deterministic; learned frac unused
        if intp_frac is not None:
            logvar = row["logvar_min"] + (row["logvar_max"] - row["logvar_min"]) * intp_frac
            sigma = jnp.exp(0.5 * logvar)

        cond = row["nonzero"]
        mean = cond * mean + (1.0 - cond) * pred_x_0

        if use_cfg:
            mean_c, mean_u = mean[:B], mean[B:]
            p_c, p_u = pred_x_0[:B], pred_x_0[B:]
            mean = mean_c + self.w_guide * (mean_c - mean_u)
            pred_x_0 = p_c + self.w_guide * (p_c - p_u)
            if intp_frac is not None:
                sigma = sigma[:B]

        sample = mean if noise is None else mean + cond * sigma * noise
        return sample, pred_x_0

    def p_sample(
        self,
        denoise_fn,
        shape,
        rng,
        noise=None,
        label=None,
        use_ddim=False,
        clip_denoised=True,
        eta=0.0,
    ):
        """Full T-step ancestral/DDIM sampling as one lax.scan (diffusion.py:394-414).

        Wrap in ``jax.jit`` at the call site (denoise_fn closes over weights).
        ``eta``: DDIM noise level (only with ``use_ddim``; see sample_tables).
        """
        tables = self.sample_tables(use_ddim=use_ddim, eta=eta)
        init_rng, step_rng = jax.random.split(rng)
        if noise is None:
            x_T = jax.random.normal(init_rng, shape, jnp.float32)
        else:
            x_T = noise

        def body(x, inp):
            i, row = inp
            # DDIM η=0 is deterministic: skip the per-step normal draw entirely
            eps = (
                None
                if (use_ddim and eta == 0.0)
                else jax.random.normal(jax.random.fold_in(step_rng, i), shape, x.dtype)
            )
            x_next, _ = self._p_sample_step(
                denoise_fn, x, row, label, eps, clip_denoised=clip_denoised,
                use_ddim=use_ddim,
            )
            return x_next, None

        idx = jnp.arange(self.sample_timesteps)
        x_0, _ = jax.lax.scan(body, x_T, (idx, tables))
        return x_0

    def p_sample_progressive(
        self,
        denoise_fn,
        shape,
        rng,
        noise=None,
        label=None,
        use_ddim=False,
        pred_freq: int = 50,
        eta=0.0,
    ):
        """Sampling that also returns intermediate x̂_0 snapshots every
        ``pred_freq`` steps (diffusion.py:416-441). Nested scan: outer emits one
        snapshot per chunk, keeping on-chip memory at O(L·B·img)."""
        T = self.sample_timesteps
        L = T // pred_freq
        tables = self.sample_tables(use_ddim=use_ddim, eta=eta)
        init_rng, step_rng = jax.random.split(rng)
        x_T = jax.random.normal(init_rng, shape, jnp.float32) if noise is None else noise

        # table row i ↔ ti = T-1-i; snapshot recorded when (ti+1) % pred_freq == 0,
        # i.e. at rows i ≡ pred_freq-1 (mod pred_freq) counted from row T % pred_freq
        def step(x, inp):
            i, row = inp
            eps = (
                None
                if (use_ddim and eta == 0.0)
                else jax.random.normal(jax.random.fold_in(step_rng, i), shape, x.dtype)
            )
            x_next, pred = self._p_sample_step(
                denoise_fn, x, row, label, eps, use_ddim=use_ddim
            )
            return x_next, pred

        head = T % pred_freq  # leading steps not followed by a snapshot
        idx = jnp.arange(T)
        x = x_T
        if head:
            x, _ = jax.lax.scan(step, x, (idx[:head], jax.tree.map(lambda a: a[:head], tables)))

        def chunk(x, inp):
            ids, rows = inp
            x, preds = jax.lax.scan(step, x, (ids, rows))
            # snapshot condition (ti+1) % pred_freq == 0 ⇔ row index ≡ T (mod
            # pred_freq) ⇔ the FIRST row of each chunk (rows run ti = T-1 → 0)
            return x, jax.tree.map(lambda p: p[0], preds)

        body_idx = idx[head:].reshape(L, pred_freq)
        body_tab = jax.tree.map(lambda a: a[head:].reshape(L, pred_freq, *a.shape[1:]), tables)
        x_0, snapshots = jax.lax.scan(chunk, x, (body_idx, body_tab))
        # reference layout (diffusion.py:431-440): preds[0] = most-denoised
        # snapshot (smallest ti); our scan emits decreasing-ti order → flip
        return x_0, snapshots[::-1]

    # ------------------------------------------------------------------
    # log-likelihood (bits per dimension; diffusion.py:446-576)
    # ------------------------------------------------------------------

    def _loss_term_bpd(self, model_out, x_0, x_t, logsnr_s, logsnr_t, clip_denoised):
        true_mean, true_logvar = self.q_posterior_mean_var(
            x_0=x_0, x_t=x_t, logsnr_s=logsnr_s, logsnr_t=logsnr_t,
            model_var_type="fixed_small",
        )
        model_mean, model_logvar, pred_x_0 = self.p_mean_var(
            model_out, x_t=x_t, logsnr_s=logsnr_s, logsnr_t=logsnr_t,
            clip_denoised=clip_denoised, use_ddim=False,
        )
        kl = N.normal_kl(true_mean, true_logvar, model_mean, model_logvar)
        kl = N.flat_mean(kl) / math.log(2.0)
        decoder_nll = -N.discretized_gaussian_loglik(
            x_0, pred_x_0, log_scale=0.5 * model_logvar
        )
        decoder_nll = N.flat_mean(decoder_nll) / math.log(2.0)
        return kl, decoder_nll, pred_x_0

    def _prior_bpd(self, x_0):
        B = x_0.shape[0]
        t = jnp.ones((B,), jnp.float32)
        logsnr_t, _ = self.t2logsnr(t, x_0.ndim)
        T_mean, T_logvar = N.q_mean_var(x_0=x_0, logsnr_t=logsnr_t)
        kl_prior = N.normal_kl(T_mean, T_logvar, 0.0, 0.0)
        return N.flat_mean(kl_prior) / math.log(2.0)

    def calc_all_bpd(self, denoise_fn, x_0, y, rng, clip_denoised=True):
        """Full per-timestep VLB evaluation as a lax.scan (diffusion.py:555-576)."""
        B = x_0.shape[0]
        T = self.sample_timesteps
        ndim = x_0.ndim

        def body(_, inp):
            i, key = inp
            s = jnp.full((B,), i / T, jnp.float32)
            t = jnp.full((B,), (i + 1.0) / T, jnp.float32)
            logsnr_s, _ = self.t2logsnr(s, ndim)
            logsnr_t, t_adj = self.t2logsnr(t, ndim)
            eps = jax.random.normal(key, x_0.shape, x_0.dtype)
            x_t = N.q_sample(x_0, logsnr_t, eps)
            model_out = denoise_fn(x_t, t_adj, y)
            kl, nll, pred_x_0 = self._loss_term_bpd(
                model_out, x_0, x_t=x_t, logsnr_s=logsnr_s, logsnr_t=logsnr_t,
                clip_denoised=clip_denoised,
            )
            loss = jnp.where(s[:1] > 0, kl, nll)
            mse = N.flat_mean((pred_x_0 - x_0) ** 2)
            return None, (loss, mse)

        idx = jnp.arange(T - 1, -1, -1)
        keys = jax.random.split(rng, T)
        _, (loss, mse) = jax.lax.scan(body, None, (idx.astype(jnp.float32), keys))
        loss = jnp.flip(loss.T, axis=1)  # (B, T), index i ↔ step i
        mse = jnp.flip(mse.T, axis=1)
        prior_bpd = self._prior_bpd(x_0)
        total_bpd = jnp.sum(loss, axis=1) + prior_bpd
        return total_bpd, loss, prior_bpd, mse
