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


@pytest.mark.slow
def test_train_device_failure_saves_and_exits_tempfail(tmp_path, monkeypatch):
    """Mid-run backend loss (the axon tunnel drop of NOTES.md): the train loop
    classifies the exception via backend_guard.is_device_failure, writes an
    emergency checkpoint within a deadline, and exits EX_TEMPFAIL (75) so a
    supervisor can restart the process and resume_state:auto continues."""
    with open("configs/smoke_train.yml") as f:
        opt = yaml.safe_load(f)
    opt["name"] = "smoke_devfail"
    opt["path"]["root"] = str(tmp_path)
    opt["train"]["niter"] = 6
    opt["logger"]["save_checkpoint_freq"] = 100  # no periodic saves before the failure
    opt["train"]["val_freq"] = 10_000
    opt["network_G"]["act_norm_start_step"] = 1
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.safe_dump(opt))

    real_make = train_cli.make_sr_nll_step
    calls = {"n": 0}

    def failing_make(spec, tx, *a, **kw):
        real_step = real_make(spec, tx, *a, **kw)

        def step(state, key, hr, lr):
            calls["n"] += 1
            if calls["n"] >= 3:
                raise RuntimeError("UNAVAILABLE: TPU backend connection dropped")
            return real_step(state, key, hr, lr)

        return step

    monkeypatch.setattr(train_cli, "make_sr_nll_step", failing_make)
    with pytest.raises(SystemExit) as ei:
        train_cli.main(["--opt", str(cfg), "--cpu"])
    assert ei.value.code == 75
    # emergency checkpoint for the last completed step (failure hit step 3)
    models = os.path.join(str(tmp_path), "experiments", "smoke_devfail", "models")
    assert os.path.exists(os.path.join(models, "2_G.ckpt")), os.listdir(models)

    # a non-infra error must NOT be swallowed
    calls["n"] = 0

    def bug_make(spec, tx, *a, **kw):
        real_step = real_make(spec, tx, *a, **kw)

        def step(state, key, hr, lr):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise ValueError("a genuine program bug")
            return real_step(state, key, hr, lr)

        return step

    opt["name"] = "smoke_devfail2"
    cfg.write_text(yaml.safe_dump(opt))
    monkeypatch.setattr(train_cli, "make_sr_nll_step", bug_make)
    with pytest.raises(ValueError, match="genuine program bug"):
        train_cli.main(["--opt", str(cfg), "--cpu"])


@pytest.mark.slow
def test_checkpoint_retention_config_override(tmp_path):
    """logger.checkpoint_keep/_keep_period override the reference's hardcoded
    keep-2 + every-5000 retention (base_model.py:82-94) so curve campaigns
    (configs/train_rescaling_x4_curve_onchip.yml) retain intermediate ckpts."""
    with open("configs/smoke_train.yml") as f:
        opt = yaml.safe_load(f)
    opt["name"] = "smoke_keepall"
    opt["path"]["root"] = str(tmp_path)
    opt["train"]["niter"] = 4
    opt["logger"]["save_checkpoint_freq"] = 1
    opt["logger"]["checkpoint_keep"] = 4
    opt["logger"]["checkpoint_keep_period"] = 0
    opt["train"]["val_freq"] = 10_000
    opt["network_G"]["act_norm_start_step"] = 1
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.safe_dump(opt))
    train_cli.main(["--opt", str(cfg), "--cpu"])
    models = os.path.join(str(tmp_path), "experiments", "smoke_keepall", "models")
    kept = sorted(
        f for f in os.listdir(models)
        if f.endswith("_G.ckpt") and not f.startswith("latest")
    )
    assert kept == ["1_G.ckpt", "2_G.ckpt", "3_G.ckpt", "4_G.ckpt"], kept
