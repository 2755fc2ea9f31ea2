"""eval.py --dp: device-parallel metric paths must equal their single-device
results (8-device CPU mesh, conftest). Covers the shared batched-apply
helper, the blocked-distance P&R paths, the streaming FID accumulator over a
sharded feature fn, and the nll VLB scan through ``compute_nll``."""

import json
import os
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "vdiff_tpu", "configs", "synthetic_smoke.json")


@pytest.fixture(scope="module")
def mesh():
    from vdiff_tpu.parallel import create_mesh

    return create_mesh()


def test_apply_batched_sharded_matches_plain(mesh):
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.metrics.device_apply import apply_batched

    @jax.jit
    def fn(x):
        return jnp.stack([x.reshape(x.shape[0], -1).sum(1), x.max((1, 2))], axis=1)

    # N=19 exercises the edge-padded tail (19 % 8 != 0, 19 % bs != 0)
    x = np.random.RandomState(0).rand(19, 5, 3).astype(np.float32)
    plain = apply_batched(fn, x, batch_size=8)
    sharded = apply_batched(fn, x, batch_size=8, mesh=mesh)
    assert plain.shape == (19, 2)
    np.testing.assert_allclose(sharded, plain, rtol=1e-6)

    # batch_size not a device multiple: rounded up internally, same rows out
    odd = apply_batched(fn, x, batch_size=5, mesh=mesh)
    np.testing.assert_allclose(odd, plain, rtol=1e-6)


def test_pr_distance_paths_sharded_match(mesh):
    from vdiff_tpu.metrics.precision_recall import (
        Manifold,
        _kth_radii,
        calc_pr,
        compute_distance,
    )

    rs = np.random.RandomState(1)
    real = rs.rand(37, 16).astype(np.float32)
    gen = rs.rand(29, 16).astype(np.float32)

    d_plain = compute_distance(gen, real, row_batch_size=16, col_batch_size=16)
    d_shard = compute_distance(gen, real, row_batch_size=16, col_batch_size=16, mesh=mesh)
    np.testing.assert_allclose(d_shard, d_plain, rtol=1e-5, atol=1e-6)

    k_plain = _kth_radii(real, 3, 16, 16)
    k_shard = _kth_radii(real, 3, 16, 16, mesh=mesh)
    np.testing.assert_allclose(k_shard, k_plain, rtol=1e-5, atol=1e-6)

    m_real = Manifold(real, k_plain)
    m_gen = Manifold(gen, _kth_radii(gen, 3, 16, 16))
    pr_plain = calc_pr(m_gen, m_real, row_batch_size=16, col_batch_size=16)
    pr_shard = calc_pr(m_gen, m_real, row_batch_size=16, col_batch_size=16, mesh=mesh)
    assert pr_shard == pr_plain


def test_fid_streaming_over_sharded_feature_fn(mesh):
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.metrics import InceptionStatistics, calc_fd
    from vdiff_tpu.metrics.device_apply import apply_batched

    D = 8
    w = np.random.RandomState(2).rand(3 * 4 * 4, D).astype(np.float32)

    @jax.jit
    def proj(x):
        return x.reshape(x.shape[0], -1) @ jnp.asarray(w)

    def make_feature_fn(m):
        return lambda x: apply_batched(proj, np.asarray(x, np.float32), 8, mesh=m)

    rs = np.random.RandomState(3)
    batches = [rs.rand(b, 4, 4, 3).astype(np.float32) for b in (8, 5, 8)]

    stats = {}
    for name, m in (("plain", None), ("dp", mesh)):
        s = InceptionStatistics(feature_fn=make_feature_fn(m), activation_dim=D)
        for b in batches:
            s(b)
        stats[name] = s.get_statistics()
    np.testing.assert_allclose(stats["dp"][0], stats["plain"][0], rtol=1e-6)
    np.testing.assert_allclose(stats["dp"][1], stats["plain"][1], rtol=1e-5, atol=1e-8)
    # and the downstream Fréchet distance agrees
    ref = (np.zeros(D), np.eye(D))
    fd_plain = calc_fd(*stats["plain"], *ref)
    fd_dp = calc_fd(*stats["dp"], *ref)
    assert np.isclose(fd_plain, fd_dp, rtol=1e-6)


@pytest.fixture(scope="module")
def nll_ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.train_lib import CheckpointManager, TrainState, make_optimizer

    with open(CONFIG) as f:
        cfg = json.load(f)
    model = UNet(in_channels=3, out_channels=3, num_classes=10, use_flash=False,
                 **cfg["model"])
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]
    opt = make_optimizer(lr=1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params),
        ema_params=None,
    )
    tmp = tmp_path_factory.mktemp("nll_dp")
    return CheckpointManager(str(tmp / "ckpts")).save(
        jax.device_get(state), epoch=1, epochs=10
    )


def test_compute_nll_dp_matches_single_device(mesh, nll_ckpt):
    from eval import compute_nll

    def args(bs):
        return types.SimpleNamespace(
            config_path=CONFIG, ckpt_path=nll_ckpt, use_ema=False,
            eval_batch_size=bs, eval_total_size=8, seed=0,
        )

    plain = compute_nll(args(8), "synthetic", "/nonexistent")
    dp = compute_nll(args(8), "synthetic", "/nonexistent", mesh=mesh)
    assert isinstance(plain, float) and np.isfinite(plain)
    np.testing.assert_allclose(dp, plain, rtol=1e-4)

    # a batch that can't split over the mesh exits with a message, not a crash
    with pytest.raises(SystemExit):
        compute_nll(args(6), "synthetic", "/nonexistent", mesh=mesh)
