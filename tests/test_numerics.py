"""Golden-value tests for L0 numerics against the torch reference on CPU.

The reference's inline self-checks (diffusion.py:583-687) are the only
executable specs it ships; these tests port them AND add direct cross-impl
comparisons: host-f64 numpy path vs torch-f64 reference, and device-f32 jnp
path vs the f64 truth within fp32 tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vdiff_tpu.ops import numerics as N
from tests.ref_loader import load

ref_diffusion = load("diffusion")
ref_functions = load("functions")

SCHEDULES = ["linear", "sigmoid", "cosine", "legacy"]


def _t_grid(n=257, lo=1e-4, hi=1.0 - 1e-4):
    return np.linspace(lo, hi, n)


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_schedule_matches_reference_f64(schedule):
    t = _t_grid()
    ours, _ = N.get_logsnr_schedule(schedule)(t)
    ref_fn = ref_diffusion.get_logsnr_schedule(schedule)
    ref = ref_fn(torch.as_tensor(t, dtype=torch.float64)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("schedule", ["linear", "sigmoid", "cosine"])
def test_schedule_rescale_matches_reference(schedule):
    t = _t_grid()
    logsnr, t_adj = N.get_logsnr_schedule(schedule, rescale=True)(t)
    t_ref = torch.as_tensor(t.copy(), dtype=torch.float64)
    ref_fn = ref_diffusion.get_logsnr_schedule(schedule, rescale=True)
    ref_logsnr = ref_fn(t_ref).numpy()  # mutates t_ref in place
    np.testing.assert_allclose(logsnr, ref_logsnr, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(t_adj, t_ref.numpy(), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_schedule_device_f32_close_to_f64(schedule):
    t = _t_grid().astype(np.float32)
    host, _ = N.get_logsnr_schedule(schedule)(t.astype(np.float64))
    dev, _ = N.get_logsnr_schedule(schedule)(jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(dev), host.astype(np.float32), rtol=2e-4, atol=2e-4)


def test_legacy_matches_discrete_ddpm():
    """Legacy schedule ≈ cumprod of the discrete linear-β DDPM schedule
    (reference test_legacy, diffusion.py:617-624)."""
    t = np.linspace(0, 1, 1000)
    logsnr, _ = N.get_logsnr_schedule("legacy")(t)
    alphas = 1.0 / (1.0 + np.exp(-logsnr))
    betas = np.linspace(0.0001, 0.02, 1000)
    alphas_ref = np.cumprod(1 - betas)
    assert np.max(np.abs(alphas - alphas_ref) / alphas_ref) < 0.02


@pytest.mark.parametrize("var_type", ["fixed_large", "fixed_small", "fixed_medium"])
@pytest.mark.parametrize("x0eps", [False, True])
def test_posterior_matches_reference(var_type, x0eps):
    lam, _ = N.get_logsnr_schedule("cosine")(np.linspace(0, 1, 1001))
    ls, lt = lam[:-1], lam[1:]
    kw = dict(intp_frac=0.3) if var_type == "fixed_medium" else {}
    ours = N.logsnr_to_posterior(ls, lt, var_type, x0eps_coef=x0eps, **kw)
    ref = ref_diffusion.logsnr_to_posterior(
        torch.as_tensor(ls), torch.as_tensor(lt), var_type, x0eps_coef=x0eps, **kw
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("eta", [0.0, 0.5, 1.0])
@pytest.mark.parametrize("x0eps", [False, True])
def test_posterior_ddim_matches_reference(eta, x0eps):
    lam, _ = N.get_logsnr_schedule("cosine")(np.linspace(0, 1, 1001))
    ls, lt = lam[:-1], lam[1:]
    ours = N.logsnr_to_posterior_ddim(ls, lt, eta=eta, x0eps_coef=x0eps)
    ref = ref_diffusion.logsnr_to_posterior_ddim(
        torch.as_tensor(ls), torch.as_tensor(lt), eta=eta, x0eps_coef=x0eps
    )
    for i, (a, b) in enumerate(zip(ours, ref)):
        b = b.numpy()
        if i == 2 and eta == 0.0:  # -inf logvar
            assert np.all(np.asarray(a) == -np.inf)
            continue
        if eta == 0.0 and x0eps:
            # reference bug: diffusion.py:182-183 forgets to exponentiate the
            # log coefficients in this (unused) branch; we implement the
            # correct math, so compare against exp(reference).
            b = np.exp(b)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_posterior_x0eps_identities():
    """Algebraic identities between parameterizations (diffusion.py:583-614)."""
    lam, _ = N.get_logsnr_schedule("cosine")(np.linspace(0, 1, 1001))
    ls, lt = lam[:-1], lam[1:]
    c1, c2, _ = N.logsnr_to_posterior(ls, lt, "fixed_small")
    c1e, c2e, _ = N.logsnr_to_posterior(ls, lt, "fixed_small", x0eps_coef=True)
    logr = lt - ls
    sig = lambda x: 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(c1 * np.sqrt(sig(-lt)), c1e, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c2 + np.sqrt(sig(ls)) * np.exp(logr), c2e, rtol=1e-5, atol=1e-6)

    # DDIM eta=1 ≡ ancestral fixed_small
    a = N.logsnr_to_posterior(ls, lt, "fixed_small")
    b = N.logsnr_to_posterior_ddim(ls, lt, eta=1.0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-7)


@pytest.mark.parametrize("conv", ["x0_from_eps", "eps_from_x0", "v_from_x0", "x0_from_v", "eps_from_v"])
def test_pred_conversions_match_reference(conv):
    rng = np.random.RandomState(0)
    x_t = rng.randn(8, 4, 4, 3).astype(np.float32)
    other = rng.randn(8, 4, 4, 3).astype(np.float32)
    logsnr = rng.uniform(-18, 18, (8, 1, 1, 1)).astype(np.float32)
    ours_fn = getattr(N, f"pred_{conv}")
    ref_fn = getattr(ref_diffusion, f"pred_{conv}")
    ours = ours_fn(jnp.asarray(x_t), jnp.asarray(other), jnp.asarray(logsnr))
    # reference is NCHW-agnostic elementwise math
    ref = ref_fn(torch.as_tensor(x_t), torch.as_tensor(other), torch.as_tensor(logsnr)).numpy()
    # f32 exp/rsqrt ULP differences amplified by e^{|logsnr|/2} factors
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_pred_x0_from_x0eps_matches_reference():
    rng = np.random.RandomState(1)
    x_t = rng.randn(4, 4, 4, 3).astype(np.float32)
    x0eps = rng.randn(4, 4, 4, 6).astype(np.float32)
    logsnr = rng.uniform(-10, 10, (4, 1, 1, 1)).astype(np.float32)
    ours = N.pred_x0_from_x0eps(jnp.asarray(x_t), jnp.asarray(x0eps), jnp.asarray(logsnr))
    ref = ref_diffusion.pred_x0_from_x0eps(
        torch.as_tensor(x_t).permute(0, 3, 1, 2),
        torch.as_tensor(x0eps).permute(0, 3, 1, 2),
        torch.as_tensor(logsnr).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_q_sample_roundtrip():
    rng = np.random.RandomState(2)
    x0 = rng.randn(8, 4, 4, 3).astype(np.float32)
    eps = rng.randn(8, 4, 4, 3).astype(np.float32)
    logsnr = rng.uniform(-15, 15, (8, 1, 1, 1)).astype(np.float32)
    x_t = N.q_sample(jnp.asarray(x0), jnp.asarray(logsnr), jnp.asarray(eps))
    x0_rec = N.pred_x0_from_eps(x_t, jnp.asarray(eps), jnp.asarray(logsnr))
    np.testing.assert_allclose(np.asarray(x0_rec), x0, rtol=1e-3, atol=1e-3)
    v = N.pred_v_from_x0eps(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(logsnr))
    x0_rec2 = N.pred_x0_from_v(x_t, v, jnp.asarray(logsnr))
    np.testing.assert_allclose(np.asarray(x0_rec2), x0, rtol=1e-3, atol=1e-3)


def test_timestep_embedding_matches_reference():
    t = np.linspace(0, 1, 100).astype(np.float32)
    ours = N.get_timestep_embedding(jnp.asarray(t), 128)
    ref = ref_functions.get_timestep_embedding(torch.as_tensor(t), 128).numpy()
    # sin/cos of args up to 1000 in f32: argument-reduction ULP differences
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=3e-3)


def test_kl_and_decoder_loglik_match_reference():
    rng = np.random.RandomState(3)
    m1, m2 = rng.randn(16), rng.randn(16)
    lv1, lv2 = rng.randn(16), rng.randn(16)
    ours = N.normal_kl(jnp.asarray(m1), jnp.asarray(lv1), jnp.asarray(m2), jnp.asarray(lv2))
    ref = ref_functions.normal_kl(*(torch.as_tensor(a) for a in (m1, lv1, m2, lv2))).numpy()
    # jnp path runs f32 (x64 disabled); torch reference runs f64 here
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5)

    x = np.clip(rng.randn(16).astype(np.float32), -1, 1)
    means = rng.randn(16).astype(np.float32) * 0.1
    log_scale = rng.randn(16).astype(np.float32) * 0.5
    ours = N.discretized_gaussian_loglik(jnp.asarray(x), jnp.asarray(means), jnp.asarray(log_scale))
    ref = ref_functions.discretized_gaussian_loglik(
        torch.as_tensor(x), torch.as_tensor(means), torch.as_tensor(log_scale)
    ).numpy()
    # log of a small CDF difference amplifies f32 tanh ULP noise
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=5e-3)


def test_stable_log1mexp_matches_reference():
    x = -np.abs(np.concatenate([np.logspace(-8, 1, 50), [20.0, 1e-9]]))
    ours = N.stable_log1mexp(x)
    ref = ref_diffusion.stable_log1mexp(torch.as_tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    # jnp path has no nan gradients/values
    dev = N.stable_log1mexp(jnp.asarray(x, jnp.float32))
    assert np.all(np.isfinite(np.asarray(dev)))
