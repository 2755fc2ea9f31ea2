"""CLI-surface tests: argparse wiring of train/generate/eval and a full
generate.py run from a *torch reference* checkpoint (conversion path)."""

import json
import os
import runpy
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "vdiff_tpu", "configs", "synthetic_smoke.json")


def _run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("script", ["train.py", "generate.py", "eval.py"])
def test_cli_help(script):
    with pytest.raises(SystemExit) as e:
        _run_cli(script, ["--help"])
    assert e.value.code == 0


def test_train_cli_rejects_unknown_flag():
    with pytest.raises(SystemExit):
        _run_cli("train.py", ["--config-path", CONFIG, "--definitely-not-a-flag"])


def test_generate_from_orbax_checkpoint(tmp_path):
    """generate.py consumes this framework's own Orbax checkpoints (with EMA)."""
    import jax
    import numpy as np
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.train_lib import CheckpointManager, TrainState, make_optimizer

    with open(CONFIG) as f:
        cfg = json.load(f)
    model = UNet(in_channels=3, out_channels=3, num_classes=0, use_flash=False, **cfg["model"])
    rng = jax.random.key(0)
    import jax.numpy as jnp

    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), None
    )["params"]
    opt = make_optimizer(lr=1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_ckpts_kept=-1)
    ckpt_path = mgr.save(jax.device_get(state), epoch=1, epochs=10)

    save_dir = str(tmp_path / "out")
    _run_cli(
        "generate.py",
        [
            "--config-path", CONFIG,
            "--ckpt-path", ckpt_path,
            "--save-dir", save_dir,
            "--total-size", "2",
            "--batch-size", "2",
            "--sample-timesteps", "2",
            "--use-ema",
            "--use-ddim",
        ],
    )
    pngs = []
    for root, _, files in os.walk(save_dir):
        pngs += [f for f in files if f.endswith(".png")]
    assert len(pngs) == 2

    # --dp: batch sharded over the 8-device mesh through the same CLI
    dp_dir = str(tmp_path / "out_dp")
    _run_cli(
        "generate.py",
        [
            "--config-path", CONFIG,
            "--ckpt-path", ckpt_path,
            "--save-dir", dp_dir,
            "--total-size", "8",
            "--batch-size", "8",
            "--sample-timesteps", "2",
            "--use-ema", "--use-ddim", "--dp",
            "--eta", "0.5",  # general-η DDIM through the CLI surface
        ],
    )
    dp_pngs = []
    for root, _, files in os.walk(dp_dir):
        dp_pngs += [f for f in files if f.endswith(".png")]
    assert len(dp_pngs) == 8

    # conflicting / non-divisible flags exit with a message, not a crash
    for bad in (["--dp", "--tp"], ["--dp", "--batch-size", "3", "--total-size", "3"]):
        with pytest.raises(SystemExit):
            _run_cli(
                "generate.py",
                ["--config-path", CONFIG, "--ckpt-path", ckpt_path,
                 "--save-dir", str(tmp_path / "x"), "--use-ddim",
                 "--sample-timesteps", "2", "--total-size", "2",
                 "--batch-size", "2"] + bad,
            )
    # --eta is a DDIM knob: without --use-ddim it must exit with a message
    with pytest.raises(SystemExit):
        _run_cli(
            "generate.py",
            ["--config-path", CONFIG, "--ckpt-path", ckpt_path,
             "--save-dir", str(tmp_path / "x"), "--eta", "0.5",
             "--sample-timesteps", "2", "--total-size", "2", "--batch-size", "2"],
        )


def test_eval_nll_passes_labels_for_conditional_ckpt(tmp_path, monkeypatch):
    """A conditional checkpoint must evaluate the conditional VLB: dataset
    labels flow into calc_all_bpd (regression: y was hardwired to None)."""
    import types

    import jax
    import jax.numpy as jnp
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.train_lib import CheckpointManager, TrainState, make_optimizer

    with open(CONFIG) as f:
        cfg = json.load(f)
    model = UNet(in_channels=3, out_channels=3, num_classes=10, use_flash=False, **cfg["model"])
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]
    assert "class_embed" in params  # conditional sniffing precondition
    opt = make_optimizer(lr=1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params),
        ema_params=None,
    )
    ckpt_path = CheckpointManager(str(tmp_path / "ckpts")).save(
        jax.device_get(state), epoch=1, epochs=10
    )

    seen = {}
    orig = GaussianDiffusion.calc_all_bpd

    def spy(self, denoise_fn, x_0, y, rng, clip_denoised=True):
        seen["y_is_none"] = y is None
        if y is not None:
            seen["y_shape"] = tuple(y.shape)
        return (jnp.zeros((x_0.shape[0],)),) + (0.0, 0.0, 0.0)

    monkeypatch.setattr(GaussianDiffusion, "calc_all_bpd", spy)
    try:
        from eval import compute_nll

        args = types.SimpleNamespace(
            config_path=CONFIG, ckpt_path=ckpt_path, use_ema=False,
            eval_batch_size=4, eval_total_size=4, seed=0,
        )
        result = compute_nll(args, "synthetic", "/nonexistent")
    finally:
        monkeypatch.setattr(GaussianDiffusion, "calc_all_bpd", orig)
    assert result == 0.0
    assert seen["y_is_none"] is False
    assert seen["y_shape"] == (4,)


def test_generate_from_torch_reference_checkpoint(tmp_path):
    """Users of the reference can point generate.py at their torch .pt
    checkpoints directly (models/convert.py migration path)."""
    from tests.ref_loader import load

    ref_unet = load("models.unet")
    with open(CONFIG) as f:
        cfg = json.load(f)

    torch.manual_seed(0)
    tm = ref_unet.UNet(
        in_channels=3, out_channels=3, num_classes=0,
        **{k: v for k, v in cfg["model"].items()},
    )
    ckpt_path = str(tmp_path / "ckpt_ref.pt")
    torch.save({"model": tm.state_dict()}, ckpt_path)

    save_dir = str(tmp_path / "out")
    _run_cli(
        "generate.py",
        [
            "--config-path", CONFIG,
            "--ckpt-path", ckpt_path,
            "--save-dir", save_dir,
            "--total-size", "4",
            "--batch-size", "4",
            "--sample-timesteps", "2",
            "--use-ddim",
        ],
    )
    pngs = []
    for root, _, files in os.walk(save_dir):
        pngs += [f for f in files if f.endswith(".png")]
    assert len(pngs) == 4

    from PIL import Image

    img_dir = None
    for root, _, files in os.walk(save_dir):
        if any(f.endswith(".png") for f in files):
            img_dir = root
    im = np.asarray(Image.open(os.path.join(img_dir, pngs[0])))
    assert im.shape == (32, 32, 3) and im.dtype == np.uint8
