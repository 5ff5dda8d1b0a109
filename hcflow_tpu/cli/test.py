"""Evaluation CLI: ``python -m hcflow_tpu.cli.test --opt <yml>``.

Behavioral reference: /root/reference/codes/test_HCFlow.py — option-file driven
evaluation over the configured test datasets with the full metric set, saving SR
images under ``results/<name>/<dataset>/``.
"""

from __future__ import annotations

import argparse
import os

import jax

from ..data import create_dataloader, create_dataset
from ..utils import config as config_mod
from ..utils.checkpoint import load_any
from ..utils.logging import setup_logger
from .evaluate import Evaluator


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", required=True, help="path to option YAML file")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif (jax.config.jax_platforms or "").strip().lower() != "cpu":
        from ..utils.backend_guard import backend_ready

        ok, reason = backend_ready(deadline_s=300.0)
        if not ok:
            import os as _os
            import sys as _sys

            print(f"TPU backend unavailable: {reason}\n"
                  "(re-run with --cpu to evaluate on CPU)", file=_sys.stderr)
            _os._exit(3)

    opt = config_mod.parse(args.opt, is_train=False)
    results_root = opt["path"]["results_root"]
    os.makedirs(results_root, exist_ok=True)
    logger = setup_logger("base", opt["path"]["log"])
    logger.info(f"platform: {jax.devices()[0].platform}, devices: {len(jax.devices())}")

    model_spec = config_mod.model_spec_from_opt(opt)

    ckpt_path = config_mod.opt_get(opt, ["path", "pretrain_model_G"])
    # os.path.exists (not isfile): orbax checkpoints are directories
    if ckpt_path and os.path.exists(ckpt_path):
        logger.info(f"loading checkpoint {ckpt_path}")
        params = load_any(ckpt_path, model_spec.flow)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
    else:
        logger.warning("no pretrained checkpoint found - using random init")
        params = model_spec.init(jax.random.PRNGKey(0))

    heats = config_mod.opt_get(opt, ["val", "heats"], [0.0])
    n_sample = config_mod.opt_get(opt, ["val", "n_sample"], 1)
    key = jax.random.PRNGKey(config_mod.opt_get(opt, ["val", "seed"], 1))

    # LPIPS (AlexNet) — only when converted weights are available offline
    from ..models import lpips as lpips_mod

    lpips_path = config_mod.opt_get(opt, ["path", "lpips_npz"], "weights/lpips_alex.npz")
    lpips_params = lpips_mod.load(lpips_path)
    lpips_label = "lpips"
    if lpips_params is None and config_mod.opt_get(
        opt, ["val", "lpips_fallback"], "off"
    ) == "random":
        logger.warning(
            f"no LPIPS weights at {lpips_path}; reporting 'lpips_rand' (He-init "
            "random AlexNet, uniform lin weights — NOT comparable to true LPIPS; "
            "opt-in via val.lpips_fallback: random; see models/lpips.py:random_params)"
        )
        lpips_params = lpips_mod.random_params(seed=0)
        lpips_label = "lpips_rand"
    lpips_fn = lpips_mod.make_metric(lpips_params) if lpips_params else None
    if lpips_fn is None:
        logger.info(f"LPIPS disabled (no weights at {lpips_path})")

    all_results = {}
    for phase, dataset_opt in sorted((opt.get("datasets") or {}).items()):
        name = dataset_opt.get("name", phase)
        ds = create_dataset(dataset_opt)
        loader = create_dataloader(ds, {**dataset_opt, "phase": "test"})
        logger.info(f"dataset [{name}]: {len(ds)} images")
        save_dir = os.path.join(results_root, name)
        evaluator = Evaluator(
            model_spec,
            params,
            heats,
            n_sample=n_sample,
            scale=opt.get("scale", 4),
            lpips_fn=lpips_fn,
            lpips_label=lpips_label,
            logger=logger,
            save_dir=save_dir,
            suffix=opt.get("suffix") or "",
            rescaling="rescaling" in (opt.get("model") or "").lower(),
        )
        real_image = dataset_opt.get("mode") == "LQ"
        all_results[name] = evaluator.run(loader, key, real_image=real_image)
    return all_results


if __name__ == "__main__":
    main()
