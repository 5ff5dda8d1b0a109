"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hcflow_tpu.parallel import batch_sharding, make_mesh, replicated


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_nll_matches_single_device():
    """Sharded loss must equal the unsharded loss (allreduce correctness)."""
    from hcflow_tpu.models import HCFlowSRSpec

    model = HCFlowSRSpec.for_scale(
        4, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, K=(2, 2), after_splitoff=(1, 1),
        hidden_channels=8, so_hidden_channels=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(2), (8, 4, 4, 3))
    key = jax.random.PRNGKey(3)

    fwd = jax.jit(model.forward)
    _, nll_single = fwd(params, key, hr, lr)

    mesh = make_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    hr_s = jax.device_put(hr, batch_sharding(mesh))
    lr_s = jax.device_put(lr, batch_sharding(mesh))
    _, nll_sharded = fwd(params_r, key, hr_s, lr_s)
    np.testing.assert_allclose(float(nll_sharded), float(nll_single), rtol=1e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_full_plusplus_iteration_sharded():
    """The complete HCFlow++ iteration (nll -> pixel -> fea/gan -> D) under a
    2-D ('data','spatial') mesh must NUMERICALLY MATCH the unsharded oracle:
    G grads, D grads, and BOTH optimizer states flow through XLA-inserted
    collectives and land on the same values (GSPMD may choose its own output
    shardings for params — that is allowed; the values are the contract).
    The reference wraps netG, netD and netF in DDP
    (HCFlow_SR_model.py:33-36,74,92); here the same coverage is a sharding
    annotation, not a wrapper."""
    from hcflow_tpu.models import HCFlowSRSpec
    from hcflow_tpu.models.discriminators import VGGDiscriminatorSpec
    from hcflow_tpu.models.vgg import VGG19FeatureSpec
    from hcflow_tpu.train import init_state, make_optimizer
    from hcflow_tpu.train.losses import l1
    from hcflow_tpu.train.schedules import schedule_from_opt
    from hcflow_tpu.train.trainer import (
        make_d_optimizer,
        make_d_step,
        make_sr_feagan_step,
        make_sr_nll_step,
        make_sr_pixel_step,
    )

    topt = {"lr_G": 2.5e-4, "max_grad_clip": 5, "max_grad_norm": 100,
            "beta1": 0.9, "beta2": 0.99, "lr_steps": [100]}
    model = HCFlowSRSpec.for_scale(
        4, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, K=(2, 2), after_splitoff=(1, 1),
        hidden_channels=8, so_hidden_channels=8,
    )
    tx = make_optimizer(topt, schedule_from_opt(topt))
    dspec = VGGDiscriminatorSpec(input_size=32)
    dtx = make_d_optimizer({"lr_D": 5e-5}, schedule_from_opt({"lr_G": 5e-5}))
    fspec = VGG19FeatureSpec()

    # masters live on host as numpy: the train steps donate their state arg,
    # so each run gets fresh device copies
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    dparams0 = jax.tree.map(np.asarray, dspec.init(jax.random.PRNGKey(5)))
    fp0 = jax.tree.map(np.asarray, fspec.init(jax.random.PRNGKey(6)))
    hr0 = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    lr0 = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 3))
    k = jax.random.PRNGKey(9)

    nll_step = make_sr_nll_step(model, tx)
    pix_step = make_sr_pixel_step(model, tx, 1.0, l1)
    fg_step = make_sr_feagan_step(
        model, tx, 0.9, gan_type="ragan", gan_weight=0.5, fea_weight=0.05,
        fea_criterion=l1, d_apply=dspec.apply, f_apply=fspec.apply,
    )
    d_step = make_d_step(dspec.apply, dtx)

    def run_iteration(state, dstate, fp, hr, lr):
        state, m1 = nll_step(state, k, hr, lr)
        state, m2 = pix_step(state, k, hr, lr)
        state, fake_h, m3 = fg_step(state, k, hr, lr, dstate.params, fp)
        dstate, m4 = d_step(dstate, hr, fake_h)
        losses = {**m1, **m2, **m3, **m4}
        return state, dstate, {k_: float(v) for k_, v in losses.items()}

    # ---- oracle: single-device (donated states -> build fresh trees per run)
    state, dstate, oracle = run_iteration(
        init_state(params0, tx), init_state(dparams0, dtx), fp0, hr0, lr0)
    oracle_params = jax.tree.map(np.asarray, state.params)
    oracle_dparams = jax.tree.map(np.asarray, dstate.params)

    # ---- sharded: same inputs under the 2-D mesh
    mesh = make_mesh(axis_names=("data", "spatial"), mesh_shape=(4, 2))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", "spatial"))
    state = jax.device_put(init_state(params0, tx), repl)
    dstate = jax.device_put(init_state(dparams0, dtx), repl)
    fp = jax.device_put(fp0, repl)
    hr = jax.device_put(hr0, batch_sh)
    lr = jax.device_put(lr0, batch_sh)
    state, dstate, sharded = run_iteration(state, dstate, fp, hr, lr)

    assert int(state.step) == 1 and int(dstate.step) == 1
    for name in oracle:
        assert np.isfinite(sharded[name]), (name, sharded[name])
        np.testing.assert_allclose(
            sharded[name], oracle[name], rtol=2e-4, atol=2e-5, err_msg=name)
    # per-element tolerance: one adam step moves each param by at most ~lr
    # (|mhat/sqrt(vhat)| <= 1 at step 1), and SPMD reduction-order noise can
    # flip the direction where the gradient is ~0 — so worst-case divergence
    # after the 3 G updates is a few lr, never more
    for (pa, pb, atol) in ((state.params, oracle_params, 8e-4),
                           (dstate.params, oracle_dparams, 2e-4)):
        for got, want in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(got)), want, rtol=0, atol=atol)

    # second iteration consumes the sharded optimizer states end-to-end
    state, m1b = nll_step(state, jax.random.fold_in(k, 1), hr, lr)
    assert bool(jnp.isfinite(m1b["nll"]))
    assert int(state.step) == 2


def test_spatially_sharded_inference():
    """'Context parallelism' analogue: shard image H across devices for inference."""
    from hcflow_tpu.models import HCFlowSRSpec

    model = HCFlowSRSpec.for_scale(
        4, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, K=(2, 2), after_splitoff=(1, 1),
        hidden_channels=8, so_hidden_channels=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    key = jax.random.PRNGKey(2)

    rev = jax.jit(lambda p, k, x: model.reverse(p, k, x, 0.0))
    want = rev(params, key, lr)

    mesh = make_mesh(axis_names=("data", "spatial"), mesh_shape=(1, 8))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    lr_s = jax.device_put(lr, NamedSharding(mesh, P("data", "spatial")))
    got = rev(params_r, key, lr_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
