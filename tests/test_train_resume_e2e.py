"""End-to-end train -> preempt -> resume through the train CLI, orbax backend.

Reference behavior: training restarted with ``resume_state: auto`` continues from
the newest saved state (train_HCFlow.py:65-74, util.py:1139-1150).  Here the cycle
runs through the orbax directory checkpoints (path.checkpoint_backend: orbax).
"""

import os

import pytest
import yaml

from hcflow_tpu.cli import train as train_cli
from hcflow_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint


@pytest.mark.slow
def test_train_preempt_resume_orbax(tmp_path):
    with open("configs/smoke_train.yml") as f:
        opt = yaml.safe_load(f)
    opt["name"] = "smoke_orbax"
    opt["path"]["root"] = str(tmp_path)
    opt["path"]["checkpoint_backend"] = "orbax"
    opt["train"]["niter"] = 4
    opt["logger"]["save_checkpoint_freq"] = 2
    opt["train"]["val_freq"] = 10_000  # no val during this smoke
    opt["network_G"]["act_norm_start_step"] = 1
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.safe_dump(opt))

    # leg 1: train 4 steps, checkpoints at 2 and 4 (orbax directories)
    train_cli.main(["--opt", str(cfg), "--cpu"])
    state_dir = os.path.join(str(tmp_path), "experiments", "smoke_orbax", "training_state")
    latest = latest_checkpoint(state_dir, ".state")
    assert latest and os.path.isdir(latest), latest
    assert latest.endswith("4.state")

    # leg 2 ("after preemption"): raise niter, rerun — must resume from step 4
    opt["train"]["niter"] = 6
    cfg.write_text(yaml.safe_dump(opt))
    state = train_cli.main(["--opt", str(cfg), "--cpu"])
    assert int(state.step) == 6
    latest = latest_checkpoint(state_dir, ".state")
    saved = load_checkpoint(latest)
    assert int(saved["step"]) == 6
