"""Orbax checkpoint backend: round-trip, retention on directories, sharded arrays.

Reference semantics being preserved: base_model.py:79-162 (keep-2 + every-5000
retention, iteration-tagged names, auto-resume by natural sort) — only the storage
format changes (async tensorstore directories instead of pickle files).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.models.hcflow_sr import HCFlowSRSpec
from hcflow_tpu.train import init_state, make_optimizer
from hcflow_tpu.train.schedules import multistep_restart
from hcflow_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
    wait_for_saves,
)

TINY = dict(
    K=(2, 2), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    hidden_channels=8, so_hidden_channels=8,
)


def _train_state():
    model = HCFlowSRSpec.for_scale(4, **TINY)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(
        {"max_grad_clip": 5, "max_grad_norm": 100, "beta1": 0.9, "beta2": 0.99},
        multistep_restart(2.5e-4, [100]),
    )
    return init_state(params, tx)


def test_orbax_roundtrip_train_state(tmp_path):
    state = _train_state()
    tree = {
        "step": 7, "params": state.params, "opt_state": state.opt_state,
        "d_params": None, "d_opt_state": None, "epoch": 1,
    }
    path = os.path.join(tmp_path, "7.state")
    save_checkpoint(path, tree, backend="orbax")
    wait_for_saves()
    assert os.path.isdir(path)

    like = {
        "step": np.asarray(0), "params": state.params, "opt_state": state.opt_state,
        "d_params": None, "d_opt_state": None, "epoch": np.asarray(0),
    }
    back = load_checkpoint(path, like=like)
    assert int(back["step"]) == 7 and int(back["epoch"]) == 1
    # exact structure (optax NamedTuples) and values
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back["opt_state"], state.opt_state,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back["params"], state.params,
    )


def test_orbax_params_only_without_like(tmp_path):
    state = _train_state()
    path = os.path.join(tmp_path, "5_G.ckpt")
    save_checkpoint(path, {"params": state.params, "step": 5}, backend="orbax")
    back = load_checkpoint(path)  # waits for the async write internally
    flat_a = jax.tree.leaves(back["params"])
    flat_b = jax.tree.leaves(state.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retention_prunes_orbax_directories(tmp_path):
    d = str(tmp_path)
    for it in [4999, 5000, 5001, 5002, 5003]:
        save_checkpoint(
            os.path.join(d, f"{it}_G.ckpt"), {"w": jnp.ones((2,)) * it},
            backend="orbax",
        )
    prune_checkpoints(d, "_G.ckpt", keep=2, keep_period=5000)
    kept = sorted(f for f in os.listdir(d) if f.endswith("_G.ckpt"))
    assert kept == ["5000_G.ckpt", "5002_G.ckpt", "5003_G.ckpt"]
    assert latest_checkpoint(d, "_G.ckpt").endswith("5003_G.ckpt")


def test_orbax_sharded_save_restore(tmp_path):
    """Multi-host-style save: sharded jax.Arrays over the 8-device mesh round-trip
    with their shardings (the reason orbax replaces pickle for large-scale runs)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sh = NamedSharding(mesh, P("data", None))
    x = jax.device_put(jnp.arange(32.0).reshape(8, 4), sh)
    path = os.path.join(tmp_path, "sharded.state")
    save_checkpoint(path, {"x": x}, backend="orbax")
    back = load_checkpoint(path, like={"x": x})
    assert back["x"].sharding.is_equivalent_to(sh, 2)
    np.testing.assert_array_equal(np.asarray(back["x"]), np.asarray(x))


def test_pickle_backend_unchanged(tmp_path):
    path = os.path.join(tmp_path, "1.state")
    save_checkpoint(path, {"a": jnp.ones((3,))})
    assert os.path.isfile(path)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["a"], np.ones((3,)))
