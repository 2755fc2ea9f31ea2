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


def test_fid_converter_roundtrip_from_manifest():
    """convert_fid_weights must consume the exact pt_inception key manifest and
    produce variables that run through the Flax net — a layout drift (renamed
    key, transposed kernel) fails here, not on weight-arrival day."""
    import jax.numpy as jnp

    from vdiff_tpu.metrics.inception import InceptionV3, convert_fid_weights
    from vdiff_tpu.metrics.manifests import fid_inception_manifest, synth_state_dict

    sd = synth_state_dict(fid_inception_manifest())
    variables = convert_fid_weights(sd)
    model = InceptionV3(output_blocks=(3,), resize_input=False, normalize_input=False)
    out = model.apply(variables, jnp.zeros((1, 75, 75, 3)))
    assert out[0].shape == (1, 1, 1, 2048)

    # the converter's param tree must cover the model's exactly (no silently
    # missing module): re-init and compare key structure
    import jax

    ref = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    assert jax.tree_util.tree_structure(ref["params"]) == jax.tree_util.tree_structure(
        variables["params"]
    )
    for got, exp in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(ref["params"])):
        assert got.shape == exp.shape

    # unknown keys must be rejected
    bad = dict(sd)
    bad["Mixed_5b.branch1x1.conv.bias"] = sd["fc.bias"]
    import pytest as _pytest

    with _pytest.raises(KeyError):
        convert_fid_weights(bad)


def test_fid_converter_accepts_pre_nbt_serialization():
    """The 2015 release file may omit num_batches_tracked (pre-torch-0.4)."""
    from vdiff_tpu.metrics.inception import convert_fid_weights
    from vdiff_tpu.metrics.manifests import fid_inception_manifest, synth_state_dict

    sd = synth_state_dict(fid_inception_manifest(include_num_batches_tracked=False))
    variables = convert_fid_weights(sd)
    assert "batch_stats" in variables


def test_vgg_converter_roundtrip_from_manifest():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from vdiff_tpu.metrics.manifests import synth_state_dict, vgg16_manifest
    from vdiff_tpu.metrics.vgg import VGG16Features, convert_vgg_weights

    sd = synth_state_dict(vgg16_manifest())
    variables = convert_vgg_weights(sd)
    model = VGG16Features()
    out = model.apply(variables, jnp.zeros((1, 224, 224, 3)))
    assert out.shape == (1, 4096)

    ref = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    assert jax.tree_util.tree_structure(ref["params"]) == jax.tree_util.tree_structure(
        variables["params"]
    )
    for got, exp in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(ref["params"])):
        assert got.shape == exp.shape

    with _pytest.raises(KeyError):
        convert_vgg_weights({**sd, "features.99.weight": sd["features.0.bias"]})


def test_vgg_converter_fc7_value_parity_vs_torch():
    """Converted fc6/fc7 must reproduce torch Linear on flattened NCHW input
    (the flatten-order trap: torch flattens (C,H,W), Flax default is (H,W,C))."""
    import numpy as np
    import torch
    import jax.numpy as jnp

    from vdiff_tpu.metrics.manifests import synth_state_dict, vgg16_manifest
    from vdiff_tpu.metrics.vgg import VGG16Features, convert_vgg_weights

    sd = synth_state_dict(vgg16_manifest(), seed=3)
    variables = convert_vgg_weights(sd)
    model = VGG16Features()

    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    # torch reference: same convs/pools/fcs assembled from the state dict
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    li = 0
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layer_ids = iter([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28])
    for v in cfg:
        if v == "M":
            t = torch.nn.functional.max_pool2d(t, 2, 2)
        else:
            i = next(layer_ids)
            t = torch.nn.functional.relu(torch.nn.functional.conv2d(
                t, torch.from_numpy(sd[f"features.{i}.weight"]),
                torch.from_numpy(sd[f"features.{i}.bias"]), padding=1))
    t = t.flatten(1)
    t = torch.nn.functional.relu(torch.nn.functional.linear(
        t, torch.from_numpy(sd["classifier.0.weight"]), torch.from_numpy(sd["classifier.0.bias"])))
    t = torch.nn.functional.linear(
        t, torch.from_numpy(sd["classifier.3.weight"]), torch.from_numpy(sd["classifier.3.bias"]))
    # f32 accumulation noise through 13 convs + a 25088-wide dot leaves a few
    # elements ~1e-2 off; a layout bug (flatten order, transpose) mismatches
    # wholesale at O(1) relative error, far above this gate
    np.testing.assert_allclose(ours, t.numpy(), rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# Inception Score
# ---------------------------------------------------------------------------


def test_is_streaming_matches_direct():
    from vdiff_tpu.metrics.inception_score import InceptionScoreStatistics, calc_is

    rng = np.random.RandomState(0)
    logits = rng.randn(97, 16) * 3
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)

    stats = InceptionScoreStatistics(prob_fn=lambda p: p, splits=5, num_classes=16)
    for s in range(0, len(probs), 13):  # uneven streaming batches
        stats.update(probs[s : s + 13])
    got = stats.get_statistics()
    want = calc_is(probs, splits=5)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_is_closed_forms():
    """Uniform p(y|x) → IS = 1; deterministic one-hot per class, classes
    balanced → IS = K."""
    from vdiff_tpu.metrics.inception_score import calc_is

    K, N = 8, 64
    uniform = np.full((N, K), 1.0 / K)
    mean, std = calc_is(uniform, splits=4)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-12)
    np.testing.assert_allclose(std, 0.0, atol=1e-12)

    # class blocks of N//K so every round-robin split still sees all K classes
    onehot = np.eye(K)[np.arange(N) // (N // K)]
    mean, std = calc_is(onehot, splits=4)
    np.testing.assert_allclose(mean, K, rtol=1e-9)


def test_is_converter_head_roundtrip_from_manifest():
    """convert_fid_weights(include_head=True) must map the release fc head
    onto the Flax Dense and produce finite softmax probabilities."""
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.metrics.inception import InceptionV3, convert_fid_weights
    from vdiff_tpu.metrics.manifests import fid_inception_manifest, synth_state_dict

    sd = synth_state_dict(fid_inception_manifest())
    variables = convert_fid_weights(sd, include_head=True)
    model = InceptionV3(
        output_blocks=(3,), resize_input=False, normalize_input=False, include_head=True
    )
    outs = model.apply(variables, jnp.zeros((1, 75, 75, 3)))
    assert outs[-1].shape == (1, 1008)

    ref = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    assert jax.tree_util.tree_structure(ref["params"]) == jax.tree_util.tree_structure(
        variables["params"]
    )
    for got, exp in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(ref["params"])):
        assert got.shape == exp.shape


def test_path_based_fid_cli_surface(tmp_path):
    """The reference retains a standalone path-based FID entry point
    (fid_score.py:319-419): dirs and npz stat files are interchangeable
    inputs, and stats can be exported for reuse."""
    from PIL import Image

    from vdiff_tpu.metrics.fid import (
        calculate_fid_given_paths,
        compute_statistics_of_path,
    )

    rs = np.random.RandomState(0)
    dirs = {}
    for name, n, shift in (("a", 12, 0), ("b", 10, 60)):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            im = rs.randint(shift, 196 + shift, size=(32, 32, 3)).astype(np.uint8)
            Image.fromarray(im).save(d / f"{i}.png")
        dirs[name] = str(d)

    w = rs.rand(32 * 32 * 3, 6).astype(np.float64) / 1000

    def feature_fn(x):
        return np.asarray(x, np.float64).reshape(len(x), -1) @ w

    fid_ab = calculate_fid_given_paths([dirs["a"], dirs["b"]], batch_size=5,
                                       feature_fn=feature_fn, dims=6)
    fid_aa = calculate_fid_given_paths([dirs["a"], dirs["a"]], batch_size=5,
                                       feature_fn=feature_fn, dims=6)
    assert np.isfinite(fid_ab) and fid_ab > 1e-3
    assert abs(fid_aa) < 1e-8

    # an exported npz is interchangeable with its source directory
    mu, sigma = compute_statistics_of_path(dirs["a"], feature_fn, batch_size=5, dims=6)
    npz = str(tmp_path / "stats_a.npz")
    np.savez(npz, mu=mu, sigma=sigma)
    fid_npz = calculate_fid_given_paths([npz, dirs["b"]], batch_size=5,
                                        feature_fn=feature_fn, dims=6)
    assert np.isclose(fid_npz, fid_ab, rtol=1e-9)

    with pytest.raises(RuntimeError):
        calculate_fid_given_paths([dirs["a"], str(tmp_path / "missing")])
