"""Metrics tests: streaming statistics correctness, Fréchet distance, blocked
Precision/Recall — all against direct numpy computation, with injected feature
functions (pretrained weights are not available offline)."""

import numpy as np
import pytest

from vdiff_tpu.metrics.fid import InceptionStatistics, calculate_frechet_distance
from vdiff_tpu.metrics.precision_recall import (
    Manifold,
    ManifoldBuilder,
    calc_pr,
    compute_distance,
)


def test_streaming_stats_match_direct():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 16).astype(np.float32)

    stats = InceptionStatistics(feature_fn=lambda x: x, activation_dim=16)
    for s in range(0, 500, 128):
        stats.update(feats[s : s + 128])
    mean, var = stats.get_statistics()

    np.testing.assert_allclose(mean, feats.mean(0), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var, np.cov(feats, rowvar=False, ddof=1), rtol=1e-4, atol=1e-6)


def test_frechet_distance_identity_and_shift():
    rng = np.random.RandomState(1)
    mu = rng.randn(8)
    sigma = np.eye(8) * 2.0
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    d = calculate_frechet_distance(mu, sigma, mu + 1.0, sigma)
    np.testing.assert_allclose(d, 8.0, rtol=1e-5)  # ||1||^2 over 8 dims


def test_frechet_distance_closed_form_diagonal():
    """For diagonal covariances: Σ_i (μ1−μ2)² + σ1+σ2−2√(σ1σ2)."""
    rng = np.random.RandomState(2)
    mu1, mu2 = rng.randn(6), rng.randn(6)
    d1, d2 = rng.rand(6) + 0.5, rng.rand(6) + 0.5
    expected = ((mu1 - mu2) ** 2).sum() + (d1 + d2 - 2 * np.sqrt(d1 * d2)).sum()
    ours = calculate_frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    np.testing.assert_allclose(ours, expected, rtol=1e-8)


def test_compute_distance_blocked_equals_direct():
    rng = np.random.RandomState(3)
    a = rng.randn(37, 8).astype(np.float32)
    b = rng.randn(23, 8).astype(np.float32)
    blocked = compute_distance(a, b, row_batch_size=10, col_batch_size=7)
    direct = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))
    # f32 ‖a‖²+‖b‖²−2a·b expansion loses ~1e-3 absolute vs the f64 direct form
    np.testing.assert_allclose(blocked, direct, rtol=5e-3, atol=5e-3)


def test_manifold_kth_radii():
    rng = np.random.RandomState(4)
    feats = rng.randn(50, 4).astype(np.float32)
    mb = ManifoldBuilder(features=feats, nhood_size=3, row_batch_size=16, col_batch_size=16)
    direct = np.sqrt(((feats[:, None] - feats[None]) ** 2).sum(-1))
    kth_direct = np.sort(direct, axis=1)[:, 3]  # 3rd NN (self at index 0)
    np.testing.assert_allclose(mb.kth, kth_direct, rtol=5e-3, atol=5e-3)


def test_calc_pr_sanity():
    rng = np.random.RandomState(5)
    real = rng.randn(200, 8).astype(np.float32)
    mb_real = ManifoldBuilder(features=real, nhood_size=3)
    # generated ≈ real (jittered copies) → precision & recall both ~1
    gen_same = ManifoldBuilder(features=real + 1e-4, nhood_size=3)
    p, r = calc_pr(gen_same.manifold, mb_real.manifold)
    assert p > 0.95 and r > 0.95
    # generated far away → both ~0
    gen_far = ManifoldBuilder(features=real[:100] + 100.0, nhood_size=3)
    p, r = calc_pr(gen_far.manifold, mb_real.manifold)
    assert p < 0.05 and r < 0.05


def test_inception_architecture_shapes():
    """FID InceptionV3 (random init) produces the right tap shapes."""
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.metrics.inception import InceptionV3

    model = InceptionV3(output_blocks=(0, 3), resize_input=True)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert outs[0].shape[-1] == 64
    assert outs[1].shape == (2, 1, 1, 2048)


def test_vgg_architecture_shapes():
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.metrics.vgg import VGG16Features

    model = VGG16Features()
    x = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 4096)
