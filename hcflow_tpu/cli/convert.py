"""Checkpoint conversion CLI: reference .pth -> native .ckpt (plus VGG/LPIPS weights).

Usage:
  python -m hcflow_tpu.cli.convert model --pth SR_CelebA_X8_HCFlow++.pth \
      --opt configs/test_SR_CelebA_8X_HCFlow.yml --out weights/SR_CelebA_X8.ckpt
  python -m hcflow_tpu.cli.convert vgg --pth vgg19-imagenet.pth --out weights/vgg19_features.npz
  python -m hcflow_tpu.cli.convert lpips --pth lpips_alex.pth --out weights/lpips_alex.npz

Torch is required only here (conversion time), never at train/serve time.
"""

from __future__ import annotations

import argparse


def _load_pth(path):
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: v.detach().numpy() for k, v in raw.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    pm = sub.add_parser("model")
    pm.add_argument("--pth", required=True)
    pm.add_argument("--opt", required=True, help="option YAML describing the topology")
    pm.add_argument("--out", required=True)
    pv = sub.add_parser("vgg")
    pv.add_argument("--pth", required=True)
    pv.add_argument("--out", required=True)
    pl = sub.add_parser("lpips")
    pl.add_argument("--pth", required=True)
    pl.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    if args.cmd == "model":
        from ..utils import config as config_mod
        from ..utils.checkpoint import save_checkpoint
        from ..utils.convert import convert_flownet, strip_module_prefix

        opt = config_mod.parse(args.opt, is_train=False)
        spec = config_mod.model_spec_from_opt(opt)
        sd = strip_module_prefix(_load_pth(args.pth))
        params = convert_flownet(sd, spec.flow, prefix="flow")
        save_checkpoint(args.out, {"params": params, "source": args.pth})
        print(f"wrote {args.out}")
    elif args.cmd == "vgg":
        from ..models.vgg import convert_torch_state_dict, save_npz

        sd = _load_pth(args.pth)
        save_npz(args.out, convert_torch_state_dict(sd))
        print(f"wrote {args.out}")
    else:
        from ..models.lpips import convert_lpips_torch, save_npz

        sd = _load_pth(args.pth)
        save_npz(args.out, convert_lpips_torch(sd))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
