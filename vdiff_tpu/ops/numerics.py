"""L0 numerics: log-SNR schedules, posterior coefficients, prediction conversions.

TPU-native re-design of the math in the reference ``v_diffusion/diffusion.py:42-257``
and ``v_diffusion/functions.py``:

* One source of truth, generic over the array namespace. The same formulas run
  (a) on **host in numpy float64** — used to precompute the per-step coefficient
  tables that drive the jitted ``lax.scan`` sampling loop (TPUs have no native
  fp64; the tables are tiny scalar math so we keep the reference's float64
  fidelity *off*-device), and
  (b) on **device in jax float32** — used for continuous-time training where t
  is a per-example traced value.
* The reference's in-place ``t`` rescale side effect (diffusion.py:105-109) is
  redesigned as a pure function: ``schedule_fn(t) -> (logsnr, t_adjusted)``.

All functions are pure and shape-polymorphic; no data-dependent Python control
flow, so everything is jit/scan friendly.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]

# ---------------------------------------------------------------------------
# namespace dispatch: numpy (host, float64) vs jax.numpy (device, float32)
# ---------------------------------------------------------------------------


def _xp(x):
    """Pick the array namespace for ``x`` (numpy for host math, jnp on device)."""
    return np if isinstance(x, (np.ndarray, np.generic, float, int)) else jnp


def _sigmoid(x):
    xp = _xp(x)
    if xp is jnp:
        return jax.nn.sigmoid(x)
    # numerically-stable numpy sigmoid
    out = np.empty_like(x, dtype=np.result_type(x, np.float64))
    x = np.asarray(x, dtype=out.dtype)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def log_sigmoid(x):
    """Stable log(sigmoid(x)); mirrors F.logsigmoid (diffusion.py:133)."""
    xp = _xp(x)
    if xp is jnp:
        return jax.nn.log_sigmoid(x)
    x = np.asarray(x, dtype=np.float64)
    return np.where(x < 0, x - np.log1p(np.exp(-np.abs(x))), -np.log1p(np.exp(-np.abs(x))))


def stable_log1mexp(x):
    """Numerically stable log(1 - exp(x)) for x < 0 (diffusion.py:115-123)."""
    xp = _xp(x)
    x = xp.asarray(x)
    # Guard both branches against invalid inputs under jnp.where semantics.
    safe_lo = xp.where(x < -9, x, -9.0)
    safe_hi = xp.where(x < -9, -9.0, xp.minimum(x, -1e-20))
    return xp.where(
        x < -9,
        xp.log1p(-xp.exp(safe_lo)),
        xp.log(-xp.expm1(safe_hi)),
    )


def _logit(t):
    xp = _xp(t)
    return xp.log(t) - xp.log1p(-t)


# ---------------------------------------------------------------------------
# log-SNR schedules (reference diffusion.py:42-112)
# ---------------------------------------------------------------------------

#: schedule_fn(t) -> (logsnr, t_adjusted); both in t's namespace.
ScheduleFn = Callable[[Array], Tuple[Array, Array]]


def get_logsnr_schedule(
    schedule: str,
    logsnr_min: float = -20.0,
    logsnr_max: float = 20.0,
    rescale: bool = False,
) -> ScheduleFn:
    """Build λ(t): scalar t∈[0,1] → log-SNR, with endpoint clamping.

    Returns a pure function ``fn(t) -> (logsnr, t_adjusted)``. ``t_adjusted``
    replaces the reference's in-place mutation of t (diffusion.py:105-109):
    with ``rescale`` on, the model must be conditioned on ``t_adjusted``.

    Matches reference semantics exactly:
    - linear: λ = logit(lerp(t_from, t_to, t))
    - sigmoid: λ affine in t
    - cosine: λ = -2 log tan(πt̃/2); rescale multiplies t by 2/π
    - legacy: closed-form continuous DDPM linear-β schedule
    """
    if schedule == "legacy":
        x_from = x_max = 0.9999
        x_min = 0.98
        slope = -0.0199

        log_x_from = math.log(x_from)

        def legacy_fn(t):
            xp = _xp(t)
            if xp is np:
                # host f64: the reference's naive form, bit-parity with
                # diffusion.py:88-92
                _t = np.asarray(t, dtype=np.float64)
                x_to = x_max + (x_min - x_max) * _t
                log_alpha = (
                    1000.0
                    / slope
                    * (x_to * np.log(x_to) - x_to - x_from * log_x_from + x_from)
                )
            else:
                # device f32: the naive form suffers catastrophic cancellation
                # (terms ~1, differences ~1e-6 near t→0). Rewrite
                # g(b)-g(a) with g(x)=x·lnx−x, b=a+δ as δ·ln a + a·h(δ/a),
                # h(r)=(1+r)·log1p(r)−r (≈ r²/2), with a series for tiny r —
                # every term is tiny and positive, no cancellation.
                # |r| ≤ 0.0199 by construction, so the series is exact to
                # ~1e-7 relative; XLA's f32 log1p is too coarse here.
                delta = (x_min - x_max) * t
                r = delta / x_from
                h = r * r * (0.5 + r * (-1.0 / 6.0 + r * (1.0 / 12.0 - r / 20.0)))
                log_alpha = (1000.0 / slope) * (delta * log_x_from + x_from * h)
            logsnr = log_alpha - stable_log1mexp(log_alpha - 1e-9)
            if xp is jnp:
                logsnr = logsnr.astype(jnp.asarray(t).dtype)
            return logsnr, t

        return legacy_fn

    if schedule == "linear":
        logsnr2t = _sigmoid
        t2logsnr = _logit
    elif schedule == "sigmoid":
        logsnr_range = logsnr_max - logsnr_min

        def logsnr2t(logsnr):
            return (logsnr_max - logsnr) / logsnr_range

        def t2logsnr(t):
            return logsnr_max - t * logsnr_range

    elif schedule == "cosine":

        def logsnr2t(logsnr):
            xp = _xp(logsnr)
            return xp.arctan(xp.exp(-0.5 * logsnr)) / (0.5 * math.pi)

        def t2logsnr(t):
            xp = _xp(t)
            return -2.0 * xp.log(xp.tan(t * math.pi * 0.5))

    else:
        raise NotImplementedError(schedule)

    # NB: the reference's `rescale = 2 / math.pi and rescale` (diffusion.py:76)
    # evaluates to the *bool* rescale (Python `and` returns the second operand),
    # so cosine rescale remaps t through logsnr2t exactly like the others; a
    # float multiplier only applies if the caller passes rescale as a float.
    rescale_factor = rescale if isinstance(rescale, float) and not isinstance(rescale, bool) else None

    # endpoint clamping via t-remap (host float64; these are Python scalars)
    t_from = float(logsnr2t(np.float64(logsnr_max)))
    t_to = float(logsnr2t(np.float64(logsnr_min)))

    def schedule_fn(t):
        xp = _xp(t)
        if xp is np:
            _t = np.asarray(t, dtype=np.float64)
        else:
            _t = t
        lerped = t_from + (t_to - t_from) * _t
        logsnr = t2logsnr(lerped)
        t_adjusted = t
        if rescale:
            if rescale_factor is None:  # bool rescale: remap t through logsnr2t
                t_adjusted = logsnr2t(logsnr)
            else:  # cosine: scalar multiplier 2/pi
                t_adjusted = t * rescale_factor
        if xp is jnp:
            dt = jnp.asarray(t).dtype
            logsnr = logsnr.astype(dt)
            t_adjusted = jnp.asarray(t_adjusted).astype(dt)
        else:
            t_adjusted = np.asarray(t_adjusted, dtype=np.float64)
        return logsnr, t_adjusted

    return schedule_fn


# ---------------------------------------------------------------------------
# posterior coefficients (reference diffusion.py:126-203)
# ---------------------------------------------------------------------------


class PosteriorCoefs(NamedTuple):
    """q(x_s | x_t, x_0) mean/variance coefficients.

    mean = mean_coef1 * x_t + mean_coef2 * x_0   (or eps in place of x_t when
    x0eps_coef). ``logvar`` is -inf for deterministic DDIM (eta=0).
    """

    mean_coef1: Array
    mean_coef2: Array
    logvar: Array


def logsnr_to_posterior(
    logsnr_s,
    logsnr_t,
    var_type: str,
    intp_frac=None,
    x0eps_coef: bool = False,
) -> PosteriorCoefs:
    """Closed-form posterior coefficients from (λ_s, λ_t); diffusion.py:126-163."""
    xp = _xp(logsnr_s)
    if xp is np:
        logsnr_s = np.asarray(logsnr_s, dtype=np.float64)
        logsnr_t = np.asarray(logsnr_t, dtype=np.float64)

    log_alpha_st = 0.5 * (log_sigmoid(logsnr_s) - log_sigmoid(logsnr_t))
    logr = logsnr_t - logsnr_s
    log_one_minus_r = stable_log1mexp(logr)

    if x0eps_coef:
        # E[x_s|x_t] = mean_coef1 * eps + mean_coef2 * x_0
        mean_coef1 = xp.exp(0.5 * (log_sigmoid(logsnr_s) - logsnr_t) + logr)
        mean_coef2 = xp.sqrt(_sigmoid(logsnr_s))
    else:
        # E[x_s|x_t] = mean_coef1 * x_t + mean_coef2 * x_0
        mean_coef1 = xp.exp(logr + log_alpha_st)
        mean_coef2 = xp.exp(log_one_minus_r + 0.5 * log_sigmoid(logsnr_s))

    if var_type == "fixed_large":
        logvar = log_one_minus_r + log_sigmoid(-logsnr_t)
    elif var_type == "fixed_small":
        logvar = log_one_minus_r + log_sigmoid(-logsnr_s)
    elif var_type == "fixed_medium":
        assert intp_frac is not None
        logvar_min = log_one_minus_r + log_sigmoid(-logsnr_s)
        logvar_max = log_one_minus_r + log_sigmoid(-logsnr_t)
        logvar = logvar_min + (logvar_max - logvar_min) * intp_frac
    else:
        raise NotImplementedError(var_type)

    return PosteriorCoefs(*(x.astype(np.float32) for x in (mean_coef1, mean_coef2, logvar)))


def logsnr_to_posterior_ddim(
    logsnr_s, logsnr_t, eta: float = 0.0, x0eps_coef: bool = False
) -> PosteriorCoefs:
    """DDIM-family posterior coefficients with η ∈ [0, 1]; diffusion.py:169-203."""
    xp = _xp(logsnr_s)
    if xp is np:
        logsnr_s = np.asarray(logsnr_s, dtype=np.float64)
        logsnr_t = np.asarray(logsnr_t, dtype=np.float64)

    if eta == 1.0:
        # reference delegates ignoring x0eps_coef (diffusion.py:173-174)
        return logsnr_to_posterior(logsnr_s, logsnr_t, "fixed_small")

    logr = logsnr_t - logsnr_s
    if eta == 0.0:
        log_one_minus_sqrt_r = stable_log1mexp(0.5 * logr)
        if x0eps_coef:
            mean_coef1 = xp.exp(0.5 * log_sigmoid(-logsnr_s))
            mean_coef2 = xp.exp(0.5 * log_sigmoid(logsnr_s))
        else:
            mean_coef1 = xp.exp(0.5 * (log_sigmoid(-logsnr_s) - log_sigmoid(-logsnr_t)))
            mean_coef2 = xp.exp(log_one_minus_sqrt_r + 0.5 * log_sigmoid(logsnr_s))
        logvar = xp.full_like(xp.asarray(mean_coef1), -np.inf)
    else:
        log_one_minus_r = stable_log1mexp(logr)
        log_eta2 = 2.0 * math.log(eta)
        logvar = log_one_minus_r + log_sigmoid(-logsnr_s) + log_eta2
        if x0eps_coef:
            mean_coef1 = xp.exp(
                0.5 * (stable_log1mexp(log_eta2 + log_one_minus_r) + log_sigmoid(-logsnr_s))
            )
            mean_coef2 = xp.exp(0.5 * log_sigmoid(logsnr_s))
        else:
            mean_coef1 = xp.exp(
                0.5
                * (
                    stable_log1mexp(log_eta2 + log_one_minus_r)
                    + log_sigmoid(-logsnr_s)
                    - log_sigmoid(-logsnr_t)
                )
            )
            mean_coef2 = xp.exp(
                stable_log1mexp(
                    0.5 * (logr + stable_log1mexp(log_eta2 + log_one_minus_r))
                )
                + 0.5 * log_sigmoid(logsnr_s)
            )

    return PosteriorCoefs(*(x.astype(np.float32) for x in (mean_coef1, mean_coef2, logvar)))


# ---------------------------------------------------------------------------
# prediction-target conversions (reference diffusion.py:206-250)
# ---------------------------------------------------------------------------


def pred_x0_from_eps(x_t, eps, logsnr_t):
    xp = _xp(x_t)
    return x_t / xp.sqrt(_sigmoid(logsnr_t)) - eps * xp.exp(-0.5 * logsnr_t)


def pred_x0_from_x0eps(x_t, x0eps, logsnr_t):
    """σ-weighted blend of the direct x_0 head and the eps-derived x_0.

    ``x0eps`` carries (x_0, eps) stacked on the channel axis (last axis, NHWC).
    Reference diffusion.py:211-214 chunks dim=1 under NCHW.
    """
    xp = _xp(x_t)
    x_0, eps = xp.split(x0eps, 2, axis=-1)
    _x_0 = pred_x0_from_eps(x_t, eps, logsnr_t)
    return x_0 * _sigmoid(-logsnr_t) + _x_0 * _sigmoid(logsnr_t)


def pred_eps_from_x0(x_t, x_0, logsnr_t):
    xp = _xp(x_t)
    return x_t / xp.sqrt(_sigmoid(-logsnr_t)) - x_0 * xp.exp(0.5 * logsnr_t)


def pred_v_from_x0eps(x_0, eps, logsnr_t):
    xp = _xp(x_0)
    return -x_0 * xp.sqrt(_sigmoid(-logsnr_t)) + eps * xp.sqrt(_sigmoid(logsnr_t))


def pred_v_from_x0(x_t, x_0, logsnr_t):
    xp = _xp(x_t)
    return x_t * xp.exp(0.5 * logsnr_t) - x_0 / xp.sqrt(_sigmoid(-logsnr_t))


def pred_x0_from_v(x_t, v, logsnr_t):
    xp = _xp(x_t)
    return x_t * xp.sqrt(_sigmoid(logsnr_t)) - v * xp.sqrt(_sigmoid(-logsnr_t))


def pred_eps_from_v(x_t, v, logsnr_t):
    xp = _xp(x_t)
    return x_t * xp.sqrt(_sigmoid(-logsnr_t)) + v * xp.sqrt(_sigmoid(logsnr_t))


def q_sample(x_0, logsnr_t, eps):
    """Forward kernel: x_t = √σ(λ)·x_0 + √σ(-λ)·ε (diffusion.py:242-245)."""
    xp = _xp(x_0)
    return x_0 * xp.sqrt(_sigmoid(logsnr_t)) + eps * xp.sqrt(_sigmoid(-logsnr_t))


def q_mean_var(x_0, logsnr_t):
    xp = _xp(x_0)
    return x_0 * xp.sqrt(_sigmoid(logsnr_t)), log_sigmoid(-logsnr_t)


# ---------------------------------------------------------------------------
# densities / KL (reference functions.py:32-75)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    xp = _xp(mean1)
    diff_logvar = logvar1 - logvar2
    return 0.5 * (
        -1.0 - diff_logvar + (mean1 - mean2) ** 2 * xp.exp(-logvar2) + xp.exp(diff_logvar)
    )


def approx_std_normal_cdf(x):
    xp = _xp(x)
    return 0.5 * (1.0 + xp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_loglik(
    x, means, log_scale, precision: float = 1.0 / 255, cutoff=(-0.999, 0.999), tol: float = 1e-12
):
    """Log-likelihood under the discretized Gaussian decoder (functions.py:51-67)."""
    if isinstance(cutoff, float):
        cutoff = (-cutoff, cutoff)
    xp = _xp(x)
    x_centered = x - means
    inv_stdv = xp.exp(-log_scale)
    upper = inv_stdv * (x_centered + precision)
    cdf_upper = xp.where(x > cutoff[1], 1.0, approx_std_normal_cdf(upper))
    lower = inv_stdv * (x_centered - precision)
    cdf_lower = xp.where(x < cutoff[0], 0.0, approx_std_normal_cdf(lower))
    return xp.log(xp.clip(cdf_upper - cdf_lower - tol, 0.0, None) + tol)


def flat_mean(x, start_dim: int = 1):
    xp = _xp(x)
    return xp.mean(x, axis=tuple(range(start_dim, x.ndim)))


def flat_sum(x, start_dim: int = 1):
    xp = _xp(x)
    return xp.sum(x, axis=tuple(range(start_dim, x.ndim)))


# ---------------------------------------------------------------------------
# timestep embedding (reference functions.py:11-29)
# ---------------------------------------------------------------------------


def get_timestep_embedding(timesteps, embed_dim: int, dtype=jnp.float32, scale: float = 1000.0):
    """Sinusoidal timestep embedding, fairseq convention (functions.py:12-29)."""
    timesteps = jnp.ravel(scale * timesteps)
    half_dim = embed_dim // 2
    freq = math.log(10000.0) / (half_dim - 1)
    freq = jnp.exp(-freq * jnp.arange(half_dim, dtype=timesteps.dtype))
    args = timesteps[:, None] * freq[None, :]
    embed = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1).astype(dtype)
    if embed_dim % 2 == 1:
        embed = jnp.pad(embed, ((0, 0), (0, 1)))
    return embed


def discrete_klv2d(hist1, hist2, eps: float = 1e-9):
    """Discretized empirical KL between two 2-D histograms (functions.py:78-82,
    toy-data evaluation helper)."""
    hist1, hist2 = np.asarray(hist1), np.asarray(hist2)
    return np.sum(hist2 * (np.log(hist2 + eps) - np.log(hist1 + eps)))


def hist2d(data, bins, value_range=None):
    """2-D histogram matrix for a point set (functions.py:85-99)."""
    data = np.asarray(data)
    if bins == "auto":
        bins = math.floor(math.sqrt(len(data) // 10))
    if value_range is not None:
        if isinstance(value_range, (int, float)):
            value_range = ((-value_range, value_range),) * 2
        elif hasattr(value_range, "__iter__"):
            if not hasattr(next(iter(value_range)), "__iter__"):
                value_range = (tuple(value_range),) * 2
    x, y = data[:, 0], data[:, 1]
    return np.histogram2d(x, y, bins=bins, range=value_range)[0]


def broadcast_to_ndim(arr, ndim: int):
    """Reshape a (B,)-vector for broadcasting against an ndim tensor (diffusion.py:19-27)."""
    xp = _xp(arr)
    arr = xp.asarray(arr)
    return arr.reshape((-1,) + (1,) * (ndim - 1))
