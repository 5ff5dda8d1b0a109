"""Option/config system: YAML files with the reference's schema -> typed specs.

Behavioral reference: /root/reference/codes/options/options.py.  The same YAML layout
is accepted (so reference option files port over unchanged): top-level name/model/
scale/quant, ``datasets.{train,val,test_*}``, ``network_G.flowDownsampler`` (K, L,
flow_permutation, flow_coupling, nn_module, hidden_channels, splitOff.*), ``train``
(lr/scheduler/loss weights), ``val``, ``logger``, ``path``.

Missing keys resolve to None via :func:`opt_get` (the reference's NoneDict), and
``parse`` performs the same derivations: is_train flag, scale propagation into
datasets, experiment/result directory layout, debug-mode frequency overrides, and
relative->absolute LR milestones.
"""

from __future__ import annotations

import os
from typing import Sequence

import yaml

from ..flow.flownet import FlowNetSpec
from ..models.hcflow_rescaling import HCFlowRescalingSpec
from ..models.hcflow_sr import HCFlowSRSpec


def opt_get(opt, keys: Sequence[str], default=None):
    if opt is None:
        return default
    cur = opt
    for k in keys:
        if not isinstance(cur, dict) or k not in cur or cur[k] is None:
            return default
        cur = cur[k]
    return cur


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def parse(path: str, is_train: bool = True) -> dict:
    """Parse an option YAML with the reference's derivations (options.py:10-90)."""
    opt = load_yaml(path)
    opt["is_train"] = is_train
    scale = opt.get("scale")

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        if scale is not None:
            dataset["scale"] = scale
        if dataset.get("dataroot_GT"):
            dataset["dataroot_GT"] = os.path.expanduser(dataset["dataroot_GT"])
        if dataset.get("dataroot_LQ"):
            dataset["dataroot_LQ"] = os.path.expanduser(dataset["dataroot_LQ"])

    opt.setdefault("path", {})
    opt["path"]["root"] = opt["path"].get("root") or os.getcwd()
    if is_train:
        exp_root = os.path.join(opt["path"]["root"], "experiments", opt.get("name", "exp"))
        opt["path"]["experiments_root"] = exp_root
        opt["path"]["models"] = os.path.join(exp_root, "models")
        opt["path"]["training_state"] = os.path.join(exp_root, "training_state")
        opt["path"]["log"] = exp_root
        opt["path"]["val_images"] = os.path.join(exp_root, "val_images")
        if "debug" in opt.get("name", ""):
            opt["train"]["val_freq"] = 8
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = os.path.join(opt["path"]["root"], "results", opt.get("name", "exp"))
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root

    # relative -> absolute LR milestones
    train = opt.get("train") or {}
    niter = train.get("niter")
    if train.get("lr_steps_rel") and niter:
        train["lr_steps"] = [int(r * niter) for r in train["lr_steps_rel"]]

    if scale is not None and "network_G" in opt:
        opt["network_G"]["scale"] = scale
    return opt


# ------------------------------------------------------------------ spec builders
def flownet_spec_from_opt(opt: dict, sr: bool = True) -> FlowNetSpec:
    """Build a FlowNetSpec from the ``network_G.flowDownsampler`` section."""
    fd = opt_get(opt, ["network_G", "flowDownsampler"], {})
    so = fd.get("splitOff", {}) or {}
    L = fd.get("L", 2)
    K = fd.get("K", 26)
    K = tuple(K) if isinstance(K, (list, tuple)) else (K,) * (L + 1)
    after = so.get("after_flowstep", 0)
    after = tuple(after) if isinstance(after, (list, tuple)) else (after,) * (L + 1)
    return FlowNetSpec(
        in_channels=opt_get(opt, ["network_G", "in_nc"], 3),
        L=L,
        K=K,
        after_splitoff=after,
        squeeze=fd.get("squeeze", "checkerboard"),
        flow_permutation=fd.get("flow_permutation", "invconv"),
        flow_coupling=fd.get("flow_coupling", "Affine"),
        nn_module=fd.get("nn_module", "FCN"),
        hidden_channels=fd.get("hidden_channels", 64),
        cond_channels=fd.get("cond_channels"),
        sr=sr,
        so_flow_permutation=so.get("flow_permutation", "invconv"),
        so_flow_coupling=so.get("flow_coupling", "Affine"),
        so_nn_module=so.get("nn_module", "FCN"),
        so_hidden_channels=so.get("hidden_channels", 64),
        rrdb_nb=tuple(so.get("RRDB_nb", (5, 5))),
        rrdb_nf=so.get("RRDB_nf", 64),
        rrdb_gc=so.get("RRDB_gc", 32),
        compute_dtype=opt_get(opt, ["network_G", "compute_dtype"]) or fd.get("compute_dtype"),
        encoder_dtype=opt_get(opt, ["network_G", "encoder_dtype"]) or fd.get("encoder_dtype"),
    )


def model_spec_from_opt(opt: dict):
    """Top-level model spec from a parsed option dict (SR or rescaling)."""
    model = (opt.get("model") or "HCFlow_SR").lower()
    if "rescaling" in model:
        return HCFlowRescalingSpec(flow=flownet_spec_from_opt(opt, sr=False))
    quant = opt.get("quant", 256)
    return HCFlowSRSpec(flow=flownet_spec_from_opt(opt, sr=True), quant=quant)
