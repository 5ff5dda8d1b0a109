"""Config/checkpoint tests: reference YAML compatibility, retention policy."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.train.schedules import schedule_from_opt
from hcflow_tpu.utils import config as config_mod
from hcflow_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)

REF_OPTS = "/root/reference/codes/options"


@pytest.mark.parametrize(
    "yml",
    [
        "train/train_SR_DF2K_4X_HCFlow.yml",
        "train/train_SR_CelebA_8X_HCFlow.yml",
        "train/train_SR_DF2K_4X_HCFlow++.yml",
        "train/train_Rescaling_DF2K_4X_HCFlow.yml",
        "test/test_SR_CelebA_8X_HCFlow.yml",
        "test/test_Rescaling_DF2K_4X_HCFlow.yml",
    ],
)
def test_reference_option_files_parse(yml):
    """The reference's own option files must parse into working model specs."""
    opt = config_mod.parse(os.path.join(REF_OPTS, yml), is_train=yml.startswith("train"))
    spec = config_mod.model_spec_from_opt(opt)
    levels = spec.flow.levels
    assert len(levels) == spec.flow.L
    # LR milestones derived if relative
    if yml.startswith("train"):
        assert schedule_from_opt(opt["train"]) is not None
        if opt["train"].get("lr_steps_rel"):
            assert opt["train"]["lr_steps"]
    # topology sanity per config family
    if "CelebA_8X" in yml:
        assert spec.flow.L == 3
    if "Rescaling" in yml:
        assert spec.flow.squeeze == "haar" and spec.flow.flow_coupling == "Affine3shift"


def test_our_configs_build_models():
    import glob

    for yml in glob.glob("configs/*.yml"):
        opt = config_mod.parse(yml, is_train="train" in os.path.basename(yml))
        spec = config_mod.model_spec_from_opt(opt)
        assert spec.flow.L >= 1


def test_checkpoint_roundtrip_and_retention(tmp_path):
    d = str(tmp_path)
    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)}, "step": 1}
    for it in [4000, 5000, 6000, 7000, 8000]:
        save_checkpoint(os.path.join(d, f"{it}_G.ckpt"), dict(tree, step=it))
    prune_checkpoints(d, "_G.ckpt", keep=2, keep_period=5000)
    kept = sorted(f for f in os.listdir(d) if f.endswith("_G.ckpt"))
    # newest two (7000, 8000) plus the 5000 multiple
    assert kept == ["5000_G.ckpt", "7000_G.ckpt", "8000_G.ckpt"]
    latest = latest_checkpoint(d, "_G.ckpt")
    assert latest.endswith("8000_G.ckpt")
    loaded = load_checkpoint(latest)
    assert loaded["step"] == 8000
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])


def test_warmup_schedule():
    sched = schedule_from_opt({"lr_G": 1.0, "lr_steps": [100], "warmup_iter": 10})
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert float(sched(10)) == 1.0
    assert float(sched(150)) == 0.5  # decay still applies
