"""Train the actual PyTorch reference (CPU) at a reduced-but-real topology and
export the trained ``<iter>_G.pth`` for the trained-weight parity harness.

This drives the reference's own training stack — ``create_model`` /
``HCFlowSRModel.optimize_parameters`` (HCFlow_SR_model.py:184-294), its GT/pkl data
pipeline, its ActNorm data-dependent init window (act_norm_start_step), and its
checkpoint writer (base_model.py:79-94) — so the resulting weights carry *trained*
actnorm statistics, invconv matrices, and coupling nets through the real code path.
The reference tree is copied to a scratch dir first (its options.py derives
experiment paths from its own repo root, which must stay read-only).

Usage:  python tools/train_reference_ckpt.py [--niter 400] [--out weights/ref_trained]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import types

REF = "/root/reference"
SCRATCH = "/tmp/refrun"

TINY_YML = """\
name: tiny_x4_parity
use_tb_logger: false
model: HCFlow_SR
distortion: sr
scale: 4
quant: 64
gpu_ids: []

datasets:
  train:
    name: faces_pkl
    mode: LRHR_PKL
    dataroot_GT: /root/repo/datasets/faces_pkl/tr.pklv4
    dataroot_LQ: /root/repo/datasets/faces_pkl/tr_X4.pklv4
    use_shuffle: true
    n_workers: 0
    batch_size: 8
    GT_size: 64
    use_crop: true
    use_flip: true
    color: RGB

network_G:
  which_model_G: HCFlowNet_SR
  in_nc: 3
  out_nc: 3
  act_norm_start_step: 100

  flowDownsampler:
    K: 8
    L: 2
    flow_permutation: invconv
    flow_coupling: Affine
    nn_module: FCN
    hidden_channels: 32
    cond_channels: ~
    splitOff:
      enable: true
      after_flowstep: [4, 4]
      flow_permutation: invconv
      flow_coupling: Affine
      nn_module: FCN
      nn_module_last: Conv2dZeros
      hidden_channels: 32
      RRDB_nb: [2, 2]
      RRDB_nf: 32
      RRDB_gc: 16

path:
  pretrain_model_G: ~
  strict_load: true
  resume_state: ~

train:
  lr_G: !!float 2.5e-4
  lr_scheme: MultiStepLR
  weight_decay_G: 0
  max_grad_clip: 5
  max_grad_norm: 100
  beta1: 0.9
  beta2: 0.99
  niter: {niter}
  warmup_iter: -1
  lr_steps_rel: [0.5, 0.75, 0.9, 0.95]
  lr_gamma: 0.5
  restarts: ~
  restart_weights: ~
  eta_min: !!float 1e-8

  nll_weight: 1
  pixel_criterion_hr: l1
  pixel_weight_hr: 0
  eps_std_reverse: 0.9
  feature_criterion: l1
  feature_weight: 0
  gan_type: gan
  gan_weight: 0
  lr_D: 0
  beta1_D: 0.9
  beta2_D: 0.99
  D_update_ratio: 1
  D_init_iters: 1500

  manual_seed: 0
  val_freq: !!float 1e9

val:
  heats: [0.0]
  n_sample: 1

logger:
  print_freq: 50
  save_checkpoint_freq: !!float 1e9
"""


def _stub_modules():
    """Stub the optional native deps the reference imports but training never uses."""
    if "lmdb" not in sys.modules:
        sys.modules["lmdb"] = types.ModuleType("lmdb")
    if "natsort" not in sys.modules:
        m = types.ModuleType("natsort")
        m.natsorted = sorted
        sys.modules["natsort"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            mpl = types.ModuleType("matplotlib")
            mpl.use = lambda *a, **k: None
            plt = types.ModuleType("matplotlib.pyplot")
            mpl.pyplot = plt
            sys.modules["matplotlib"] = mpl
            sys.modules["matplotlib.pyplot"] = plt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=400)
    ap.add_argument("--out", default="weights/ref_trained")
    ap.add_argument("--scratch", default=SCRATCH)
    args = ap.parse_args(argv)

    # fresh scratch copy of the reference (options.py writes under its repo root)
    if os.path.isdir(args.scratch):
        shutil.rmtree(args.scratch)
    shutil.copytree(REF, args.scratch)
    codes = os.path.join(args.scratch, "codes")
    yml = os.path.join(codes, "options", "train", "tiny_x4_parity.yml")
    with open(yml, "w") as f:
        f.write(TINY_YML.format(niter=args.niter))

    _stub_modules()
    sys.path.insert(0, codes)
    os.chdir(codes)

    import torch

    torch.manual_seed(0)

    import options.options as option
    from data import create_dataloader, create_dataset
    from models import create_model
    from utils import util

    opt = option.parse(yml, is_train=True)
    opt = option.dict_to_nonedict(opt)
    opt["gpu_ids"] = []  # len() used by the dataloader factory (data/__init__.py:17)
    opt["dist"] = False
    util.mkdirs(
        path for key, path in opt["path"].items()
        if not key == "experiments_root" and "pretrain_model" not in key
        and "resume" not in key
    )
    util.set_random_seed(opt["train"]["manual_seed"])

    dataset_opt = opt["datasets"]["train"]
    train_set = create_dataset(dataset_opt)
    train_loader = create_dataloader(train_set, dataset_opt, opt, None)
    opt["gpu_ids"] = None  # CPU device selection (base_model.py:13)
    model = create_model(opt)

    niter = int(opt["train"]["niter"])
    step = 0
    import time

    t0 = time.time()
    while step < niter:
        for train_data in train_loader:
            if step >= niter:
                break
            step += 1
            model.update_learning_rate(step, warmup_iter=opt["train"]["warmup_iter"])
            model.feed_data(train_data)
            model.optimize_parameters(step)
            if step % int(opt["logger"]["print_freq"]) == 0:
                logs = model.get_current_log()
                msg = ", ".join(f"{k}: {float(v):.4e}" for k, v in logs.items())
                print(f"step {step}/{niter} ({(time.time()-t0)/step:.2f}s/it): {msg}",
                      flush=True)

    model.save(step)
    model.save_training_state(0, step)

    src = os.path.join(opt["path"]["models"], f"{step}_G.pth")
    out_dir = os.path.join("/root/repo", args.out)
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f"tiny_x4_{step}_G.pth")
    shutil.copy(src, dst)
    shutil.copy(yml, os.path.join(out_dir, "tiny_x4_parity.yml"))
    print(f"saved {dst}")


if __name__ == "__main__":
    main()
