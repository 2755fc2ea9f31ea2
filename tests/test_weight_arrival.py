"""Weight-arrival rehearsal: the full on-disk loading path — torch ``.pth``
file → ``torch.load`` → converter → jitted Flax forward → metric number —
executed end-to-end with *fabricated* weight files in the release formats.

Real pretrained files can't exist here (no egress), so the values are
synthetic; what this pins is that the day the real ``pt_inception`` /
torchvision ``vgg16`` files are dropped into a search dir, every seam from
filename discovery to the final FID / P&R float already runs."""

import os
import types

import numpy as np
import pytest
import torch


@pytest.fixture()
def fake_weight_dir(tmp_path, monkeypatch):
    """A search dir containing fabricated pytorch-fid and torchvision-vgg16
    weight files built from the exact release manifests."""
    from vdiff_tpu.metrics import inception as inception_mod
    from vdiff_tpu.metrics import vgg as vgg_mod
    from vdiff_tpu.metrics.manifests import (
        fid_inception_manifest,
        synth_state_dict,
        vgg16_manifest,
    )

    d = str(tmp_path / "weights")
    os.makedirs(d)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          synth_state_dict(fid_inception_manifest(), seed=0).items()}
    torch.save(sd, os.path.join(d, inception_mod.FID_WEIGHTS_FILENAME))
    vd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          synth_state_dict(vgg16_manifest(), seed=1).items()}
    torch.save(vd, os.path.join(d, "vgg16-397923af.pth"))
    monkeypatch.setattr(inception_mod, "_SEARCH_DIRS", (d,))
    monkeypatch.setattr(vgg_mod, "_SEARCH_DIRS", (d,))
    return d


def test_fid_from_fabricated_weight_file(fake_weight_dir, tmp_path):
    """eval.py's compute_fid produces a finite FID through the real loader
    (file discovery, torch.load, conversion, jit apply, streaming stats)."""
    from eval import compute_fid

    rs = np.random.RandomState(0)
    # fabricated "precomputed" reference stats in the TTUR npz format
    a = rs.rand(8, 2048)
    np.savez(str(tmp_path / "fid_stats_synthetic.npz"),
             mu=a.mean(0), sigma=np.cov(a, rowvar=False) + np.eye(2048) * 1e-3)

    batches = [rs.randint(0, 255, size=(2, 32, 32, 3)).astype(np.uint8)]
    fid = compute_fid(batches, "synthetic", str(tmp_path))
    assert np.isfinite(fid)


def test_pr_from_fabricated_weight_file(fake_weight_dir):
    """ManifoldBuilder + calc_pr through the real VGG16 loader."""
    from vdiff_tpu.metrics.precision_recall import ManifoldBuilder, calc_pr

    rs = np.random.RandomState(2)
    imgs = rs.randint(0, 255, size=(4, 32, 32, 3)).astype(np.uint8)
    gen = rs.randint(0, 255, size=(3, 32, 32, 3)).astype(np.uint8)
    m_real = ManifoldBuilder(data=imgs, extr_batch_size=4, nhood_size=1,
                             row_batch_size=8, col_batch_size=8).manifold
    m_gen = ManifoldBuilder(data=gen, extr_batch_size=4, nhood_size=1,
                            row_batch_size=8, col_batch_size=8).manifold
    assert m_real.features.shape == (4, 4096)
    precision, recall = calc_pr(m_gen, m_real, row_batch_size=8, col_batch_size=8)
    assert 0.0 <= precision <= 1.0 and 0.0 <= recall <= 1.0
