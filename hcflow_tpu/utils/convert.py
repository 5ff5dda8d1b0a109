"""PyTorch-reference checkpoint conversion: HCFlow .pth state_dicts -> JAX pytrees.

Maps the reference's parameter naming (see /root/reference/codes/models/modules/*,
e.g. ``flow.layers.<i>.actnorm.bias``, ``flow.level0_condFlow.RRDB_trunk0.0.RDB1...``)
onto this framework's NHWC pytrees:

- conv weights: OIHW -> HWIO transpose,
- actnorm bias/logs: (1,C,1,1) -> (C,),
- Conv2dZeros logs: (C,1,1) -> (C,),
- homogeneous FlowStep sequences are stacked along a leading axis for lax.scan.

Works on a plain ``dict[str, np.ndarray]`` (load the .pth with
``torch.load(..., map_location='cpu')`` and call ``.numpy()`` per tensor; the optional
``module.`` DataParallel prefix is stripped).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..flow.conditional import ConditionalFlowSpec
from ..flow.flownet import FlowNetSpec
from ..flow.flowstep import FlowStepSpec

Array = np.ndarray
StateDict = Dict[str, Array]


def strip_module_prefix(sd: StateDict) -> StateDict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _j(p: str, name: str) -> str:
    return f"{p}.{name}" if p else name


def _conv_w(w: Array) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW -> HWIO


def _vec(x: Array) -> jnp.ndarray:
    return jnp.asarray(np.reshape(x, (-1,)))


def convert_actnorm(sd: StateDict, p: str) -> dict:
    return {"bias": _vec(sd[_j(p, "bias")]), "logs": _vec(sd[_j(p, "logs")])}


def convert_conv(sd: StateDict, p: str) -> dict:
    return {"w": _conv_w(sd[_j(p, "weight")]), "b": jnp.asarray(sd[_j(p, "bias")])}


def convert_conv_actnorm(sd: StateDict, p: str) -> dict:
    return {"w": _conv_w(sd[_j(p, "weight")]), "actnorm": convert_actnorm(sd, _j(p, "actnorm"))}


def convert_conv_zeros(sd: StateDict, p: str) -> dict:
    return {
        "w": _conv_w(sd[_j(p, "weight")]),
        "b": jnp.asarray(sd[_j(p, "bias")]),
        "logs": _vec(sd[_j(p, "logs")]),
    }


def convert_fcn(sd: StateDict, p: str) -> dict:
    return {
        "conv1": convert_conv_actnorm(sd, _j(p, "conv1")),
        "conv2": convert_conv_actnorm(sd, _j(p, "conv2")),
        "conv3": convert_conv_zeros(sd, _j(p, "conv3")),
    }


def convert_dense_block(sd: StateDict, p: str) -> dict:
    return {f"conv{i}": convert_conv(sd, _j(p, f"conv{i}")) for i in range(1, 6)}


def convert_rdb(sd: StateDict, p: str) -> dict:
    return {f"conv{i}": convert_conv(sd, _j(p, f"conv{i}")) for i in range(1, 6)}


def convert_rrdb(sd: StateDict, p: str) -> dict:
    return {f"rdb{i}": convert_rdb(sd, _j(p, f"RDB{i}")) for i in range(1, 4)}


def convert_rrdb_trunk(sd: StateDict, p: str, nb: int) -> dict:
    per = [convert_rrdb(sd, _j(p, str(i))) for i in range(nb)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def _convert_net(sd: StateDict, p: str, nn_module: str) -> dict:
    return convert_fcn(sd, p) if nn_module == "FCN" else convert_dense_block(sd, p)


def convert_invconv(sd: StateDict, p: str) -> dict:
    if _j(p, "weight") in sd:
        return {"weight": jnp.asarray(sd[_j(p, "weight")])}
    return {
        "p": jnp.asarray(sd[_j(p, "p")]),
        "sign_s": jnp.asarray(sd[_j(p, "sign_s")]),
        "l": jnp.asarray(sd[_j(p, "l")]),
        "log_s": jnp.asarray(sd[_j(p, "log_s")]),
        "u": jnp.asarray(sd[_j(p, "u")]),
    }


def convert_flowstep(sd: StateDict, p: str, spec: FlowStepSpec) -> dict:
    params = {"actnorm": convert_actnorm(sd, _j(p, "actnorm"))}
    if spec.flow_permutation == "invconv":
        params["invconv"] = convert_invconv(sd, _j(p, "permute"))
    if spec.flow_coupling == "AffineInjector":
        params["coupling"] = {
            "f": _convert_net(sd, _j(p, "affine.f"), spec.nn_module),
            "f_injector": _convert_net(sd, _j(p, "affine.f_injector"), spec.nn_module),
        }
    elif spec.flow_coupling != "noCoupling":
        params["coupling"] = {"f": _convert_net(sd, _j(p, "affine.f"), spec.nn_module)}
    return params


def convert_condflow(sd: StateDict, p: str, spec: ConditionalFlowSpec) -> dict:
    params = {
        "conv_first": convert_conv(sd, _j(p, "conv_first")),
        "trunk0": convert_rrdb_trunk(sd, _j(p, "RRDB_trunk0"), spec.rrdb_nb[0]),
        "trunk1": convert_rrdb_trunk(sd, _j(p, "RRDB_trunk1"), spec.rrdb_nb[1]),
        "trunk_conv1": convert_conv(sd, _j(p, "trunk_conv1")),
        "f": convert_conv_zeros(sd, _j(p, "f")),
    }
    if spec.n_flow_step > 0:
        per = [
            convert_flowstep(sd, _j(p, f"additional_flow_steps.{k}"), spec.step_spec)
            for k in range(spec.n_flow_step)
        ]
        params["steps"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    return params


def convert_flownet(sd: StateDict, spec: FlowNetSpec, prefix: str = "flow") -> dict:
    """Convert the full FlowNet, walking the reference's flat layer list.

    Reference layer order per level: squeeze, n_main FlowSteps, Split
    (FlowNet_SR_x4.py:33-64); conditional flows live in named attributes
    ``level<i>_condFlow``.
    """
    params = {}
    pre = f"{prefix}." if prefix else ""
    idx = 0
    for lv in spec.levels:
        idx += 1  # squeeze layer (no params; Haar buffer ignored)
        if lv.alternate_lrvsothers:
            main = []
            for k in range(lv.n_main):
                main.append(convert_flowstep(sd, f"{pre}layers.{idx + k}", lv.main_step_spec(k)))
        elif lv.n_main > 0:
            per = [
                convert_flowstep(sd, f"{pre}layers.{idx + k}", lv.main_spec)
                for k in range(lv.n_main)
            ]
            main = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
        else:
            main = []
        idx += lv.n_main
        idx += 1  # Split layer (no params)
        params[f"level{lv.level}"] = {
            "main": main,
            "cond": convert_condflow(sd, f"{pre}level{lv.level}_condFlow", lv.cond_spec),
        }
    return params


def load_reference_checkpoint(path: str, spec: FlowNetSpec, prefix: str = "flow") -> dict:
    """Load a released HCFlow .pth (requires torch) and convert to a pytree."""
    import torch

    raw = torch.load(path, map_location="cpu")
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = strip_module_prefix({k: v.detach().numpy() for k, v in raw.items()})
    return convert_flownet(sd, spec, prefix)
