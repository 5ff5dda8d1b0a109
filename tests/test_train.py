"""Trainer tests: the full HCFlow++ pass structure, rescaling joint step, NaN guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.models import HCFlowRescalingSpec, HCFlowSRSpec
from hcflow_tpu.models.discriminators import VGGDiscriminatorSpec
from hcflow_tpu.models.vgg import VGG19FeatureSpec
from hcflow_tpu.train import init_state, make_optimizer
from hcflow_tpu.train.losses import l1
from hcflow_tpu.train.schedules import cosine_restart, multistep_restart, schedule_from_opt
from hcflow_tpu.train.trainer import (
    make_d_optimizer,
    make_d_step,
    make_rescaling_step,
    make_sr_feagan_step,
    make_sr_nll_step,
    make_sr_pixel_step,
)

TOPT = {
    "lr_G": 2.5e-4,
    "max_grad_clip": 5,
    "max_grad_norm": 100,
    "beta1": 0.9,
    "beta2": 0.99,
    "lr_steps": [100, 200],
}


def tiny_sr_model():
    return HCFlowSRSpec.for_scale(
        4, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, K=(3, 3), after_splitoff=(1, 1),
        hidden_channels=8, so_hidden_channels=8,
    )


@pytest.mark.smoke
def test_schedules():
    s = multistep_restart(1.0, [10, 20], gamma=0.5)
    assert float(s(0)) == 1.0
    assert float(s(10)) == 0.5
    assert float(s(25)) == 0.25
    s2 = multistep_restart(1.0, [10, 20], gamma=0.5, restarts=[15], restart_weights=[0.5])
    assert float(s2(16)) == 0.5  # restarted base, milestone 20 not yet passed
    np.testing.assert_allclose(float(s2(25)), 0.25)  # 0.5 * gamma after milestone 20
    c = cosine_restart(1.0, [10, 10], eta_min=0.0)
    np.testing.assert_allclose(float(c(0)), 1.0)
    np.testing.assert_allclose(float(c(10)), 1.0)  # restart
    assert float(c(5)) < 1.0
    assert schedule_from_opt(TOPT) is not None


@pytest.mark.smoke
def test_clear_state_restart_steps():
    """clear_state semantics (reference lr_scheduler.py:9-24): optimizer moments
    reset at restart+1; off by default."""
    from hcflow_tpu.train.schedules import restart_steps

    assert restart_steps({"restarts": [100, 200]}) == frozenset()  # default off
    assert restart_steps({"clear_state": True, "restarts": [100, 200]}) == {101, 201}
    assert restart_steps({"clear_state": True, "lr_scheme": "CosineAnnealingLR_Restart",
                          "T_period": [50, 50, 100]}) == {51, 101}
    assert restart_steps({"clear_state": True}) == frozenset()

    # clearing actually zeroes Adam moments while keeping params
    import jax
    import jax.numpy as jnp
    import optax

    from hcflow_tpu.train import init_state, make_optimizer

    tx = make_optimizer({"max_grad_clip": 5}, lambda s: 1e-3)
    params = {"w": jnp.ones((3,))}
    state = init_state(params, tx)
    for _ in range(3):
        u, new_opt = tx.update({"w": jnp.ones((3,))}, state.opt_state, state.params,
                               step=state.step)
        state = state.replace(params=optax.apply_updates(state.params, u),
                              opt_state=new_opt, step=state.step + 1)
    mu_before = jax.tree_util.tree_leaves(state.opt_state)
    assert any(float(jnp.abs(m).sum()) > 0 for m in mu_before if hasattr(m, "sum"))
    cleared = state.replace(opt_state=tx.init(state.params))
    np.testing.assert_array_equal(np.asarray(cleared.params["w"]),
                                  np.asarray(state.params["w"]))


@pytest.mark.smoke
def test_schedule_is_iteration_indexed():
    """The LR is driven by TrainState.step, not optax's internal update count:
    (a) multiple tx.update calls per iteration (HCFlow+/++: 2-3 G passes) do NOT
    advance the schedule; (b) clear_state (tx.init) does NOT rewind it.
    Reference semantics: torch scheduler.step() once per iteration,
    lr_scheduler.py:23-24 clears only optimizer.state."""
    import jax.numpy as jnp
    import optax

    from hcflow_tpu.train import init_state, make_optimizer
    from hcflow_tpu.train.schedules import multistep_restart

    sched = multistep_restart(1.0, milestones=[2], gamma=0.1)
    tx = make_optimizer({}, sched)
    params = {"w": jnp.zeros((1,))}
    state = init_state(params, tx)
    grads = {"w": jnp.ones((1,))}

    def upd(state, advance):
        u, new_opt = tx.update(grads, state.opt_state, state.params, step=state.step)
        return state.replace(
            params=optax.apply_updates(state.params, u), opt_state=new_opt,
            step=state.step + (1 if advance else 0),
        ), u["w"]

    # iteration 0: three updates through the shared tx (nll+pix+feagan pattern);
    # all three see schedule(0)=1.0 — with a count-driven schedule the third
    # would already see the milestone decay
    for _ in range(2):
        state, u = upd(state, advance=False)
        assert abs(float(-u[0]) - 1.0) < 1e-5, u
    state, u = upd(state, advance=True)
    assert abs(float(-u[0]) - 1.0) < 1e-5, u
    # iterations 1, 2: milestone fires at step>=2 exactly
    state, u = upd(state, advance=True)
    assert abs(float(-u[0]) - 1.0) < 1e-5, u
    # clear_state between: schedule position must survive
    state = state.replace(opt_state=tx.init(state.params))
    state, u = upd(state, advance=True)
    assert abs(float(-u[0]) - 0.1) < 1e-6, u  # still decayed, not rewound to lr=1


@pytest.mark.slow
def test_full_plusplus_iteration():
    """One complete HCFlow++ iteration: nll -> pixel -> fea/gan -> D update."""
    model = tiny_sr_model()
    p = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(TOPT, schedule_from_opt(TOPT))
    state = init_state(p, tx)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))

    dspec = VGGDiscriminatorSpec(input_size=32)
    dstate = init_state(
        dspec.init(jax.random.PRNGKey(5)),
        make_d_optimizer({"lr_D": 5e-5}, schedule_from_opt({"lr_G": 5e-5})),
    )
    fspec = VGG19FeatureSpec()
    fp = fspec.init(jax.random.PRNGKey(6))

    dtx = make_d_optimizer({"lr_D": 5e-5}, schedule_from_opt({"lr_G": 5e-5}))
    k = jax.random.PRNGKey(9)
    state, m1 = make_sr_nll_step(model, tx)(state, k, hr, lr)
    assert jnp.isfinite(m1["nll"])
    state, m2 = make_sr_pixel_step(model, tx, 1.0, l1)(state, k, hr, lr)
    assert jnp.isfinite(m2["l_g_pix_hr"])
    fg = make_sr_feagan_step(
        model, tx, 0.9, gan_type="gan", gan_weight=0.5, fea_weight=0.05,
        fea_criterion=l1, d_apply=dspec.apply, f_apply=fspec.apply,
    )
    state, fake_h, m3 = fg(state, k, hr, lr, dstate.params, fp)
    assert fake_h.shape == hr.shape
    assert jnp.isfinite(m3["l_g_gan"]) and jnp.isfinite(m3["l_g_fea"])
    dstate, m4 = make_d_step(dspec.apply, dtx)(dstate, hr, fake_h)
    assert jnp.isfinite(m4["l_d_real"]) and jnp.isfinite(m4["l_d_fake"])
    assert int(state.step) == 1 and int(dstate.step) == 1


def test_patchgan_discriminator():
    """PatchGANDiscriminator (ref discriminator_vgg_arch.py:159-189): stride-1
    VALID 3x3 convs + BN, 1-channel prediction map — each of the n_layers+2
    convs shrinks H/W by 2; gradients flow; works as the D in a GAN step."""
    from hcflow_tpu.models.discriminators import PatchGANDiscriminatorSpec
    from hcflow_tpu.train.schedules import schedule_from_opt
    from hcflow_tpu.train.trainer import make_d_optimizer, make_d_step

    spec = PatchGANDiscriminatorSpec(in_nc=3, ndf=8, n_layers=3)
    p = spec.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 24, 3))
    out = spec.apply(p, x)
    shrink = 2 * (spec.n_layers + 2)  # conv_in + n_layers + conv_out, valid 3x3
    assert out.shape == (2, 24 - shrink, 24 - shrink, 1), out.shape

    g = jax.grad(lambda pp: jnp.mean(spec.apply(pp, x) ** 2))(p)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree.leaves(g))

    # full D update on the prediction map (gan_loss reduces over the map);
    # lsgan per the reference's "patchgan uses lsgan" note
    dtx = make_d_optimizer({"lr_D": 1e-4}, schedule_from_opt({"lr_G": 1e-4}))
    dstate = init_state(p, dtx)
    fake = jax.random.uniform(jax.random.PRNGKey(2), (2, 24, 24, 3))
    dstate, m = make_d_step(spec.apply, dtx, gan_type="lsgan")(dstate, x, fake)
    assert bool(jnp.isfinite(m["l_d_real"])) and bool(jnp.isfinite(m["l_d_fake"]))
    assert int(dstate.step) == 1


@pytest.mark.smoke
def test_patchgan_config_wiring():
    """which_model_D: PatchGANDiscriminator selects the PatchGAN spec with
    network_D in_nc/ndf/n_layers (ref networks.py:52-53)."""
    from hcflow_tpu.models.discriminators import PatchGANDiscriminatorSpec
    from hcflow_tpu.utils.config import opt_get

    opt = {"network_D": {"which_model_D": "PatchGANDiscriminator",
                         "in_nc": 3, "ndf": 16, "n_layers": 2}}
    # mirrors the cli/train.py selection branch
    which_d = opt_get(opt, ["network_D", "which_model_D"], "") or ""
    assert which_d == "PatchGANDiscriminator"
    spec = PatchGANDiscriminatorSpec(
        in_nc=opt_get(opt, ["network_D", "in_nc"], 3) or 3,
        ndf=opt_get(opt, ["network_D", "ndf"], 64) or 64,
        n_layers=opt_get(opt, ["network_D", "n_layers"], 5) or 5,
    )
    assert spec.ndf == 16 and spec.n_layers == 2


def test_nan_guard_skips_update():
    """A non-finite batch must leave params unchanged (apply_if_finite semantics)."""
    model = tiny_sr_model()
    p = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(TOPT, schedule_from_opt(TOPT))
    state = init_state(p, tx)
    hr = jnp.full((2, 32, 32, 3), jnp.nan)
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    before = jax.tree.map(lambda x: x.copy(), state.params)
    state, m = make_sr_nll_step(model, tx)(state, jax.random.PRNGKey(3), hr, lr)
    after = state.params
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_rescaling_joint_step():
    model = HCFlowRescalingSpec.default_x4(
        K=(3, 3), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
        hidden_channels=8, so_hidden_channels=8,
    )
    p = model.init(jax.random.PRNGKey(7))
    tx = make_optimizer(TOPT, schedule_from_opt(TOPT))
    state = init_state(p, tx)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))
    step = make_rescaling_step(model, tx, 5e-2, 1e-5, 1.0)
    state, m = step(state, jax.random.PRNGKey(9), hr, lr)
    for v in m.values():
        assert jnp.isfinite(v)
    assert int(state.step) == 1


@pytest.mark.slow
def test_rescaling_plusplus_iteration():
    """Rescaling with fea/GAN heads (ref:HCFlow_Rescaling_model.py:237-297):
    ONE G backward carrying joint + fea + gan terms (fake_H shared), then the
    D update on the same fake_H — unlike SR's separate third pass."""
    model = HCFlowRescalingSpec.default_x4(
        K=(3, 3), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
        hidden_channels=8, so_hidden_channels=8,
    )
    # numpy masters: the jitted steps donate their state arg, so each
    # init_state(p, tx) call must build fresh device copies
    p = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tx = make_optimizer(TOPT, schedule_from_opt(TOPT))
    state = init_state(p, tx)
    dspec = VGGDiscriminatorSpec(input_size=32)
    dtx = make_d_optimizer({"lr_D": 5e-5}, schedule_from_opt({"lr_G": 5e-5}))
    dstate = init_state(dspec.init(jax.random.PRNGKey(5)), dtx)
    fspec = VGG19FeatureSpec()
    fp = fspec.init(jax.random.PRNGKey(6))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))

    step = make_rescaling_step(
        model, tx, 5e-2, 1e-5, 1.0, gan_type="ragan", gan_weight=0.5,
        fea_weight=0.05, fea_criterion=l1, d_apply=dspec.apply,
        f_apply=fspec.apply,
    )
    state, fake_h, m = step(state, jax.random.PRNGKey(9), hr, lr, dstate.params, fp)
    assert fake_h.shape == hr.shape
    assert {"l_g_lr", "l_g_z", "l_g_hr", "l_g_fea", "l_g_gan"} <= set(m)
    dstate, md = make_d_step(dspec.apply, dtx, "ragan")(dstate, hr, fake_h)
    for v in {**m, **md}.values():
        assert jnp.isfinite(v), (m, md)
    assert int(state.step) == 1 and int(dstate.step) == 1
    # the heads must contribute to the G gradient: compare against the
    # head-free joint step from the same initial state — params should differ
    state2, _ = make_rescaling_step(model, tx, 5e-2, 1e-5, 1.0)(
        init_state(p, tx), jax.random.PRNGKey(9), hr, lr)
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    ]
    assert max(diffs) > 0, "fea/GAN heads had no effect on the update"


@pytest.mark.smoke
def test_gan_loss_variants():
    from hcflow_tpu.train.losses import gan_loss, gradient_penalty

    logits = jnp.array([[1.5], [-0.5]])
    for t in ("gan", "lsgan", "wgangp", "ragan"):
        lr_ = gan_loss(t, logits, True)
        lf_ = gan_loss(t, logits, False)
        assert jnp.isfinite(lr_) and jnp.isfinite(lf_)
    assert float(gan_loss("wgangp", logits, True)) == -float(jnp.mean(logits))

    # gradient penalty: for a linear critic D(x)=sum(w*x), grad norm is |w|
    d_apply = lambda p, x: jnp.sum(x * p, axis=(1, 2, 3))
    p = jnp.full((1, 4, 4, 3), 2.0)
    real = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 3))
    fake = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 4, 3))
    gp = gradient_penalty(d_apply, p, jax.random.PRNGKey(2), real, fake)
    want = (jnp.sqrt(jnp.sum(p**2)) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), float(want), rtol=1e-5)


@pytest.mark.smoke
def test_d_step_all_gan_types():
    from hcflow_tpu.models.discriminators import PatchGANDiscriminatorSpec
    from hcflow_tpu.train.trainer import make_d_optimizer, make_d_step
    from hcflow_tpu.train.schedules import multistep_restart

    dspec = PatchGANDiscriminatorSpec(ndf=8, n_layers=1)
    real = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    fake = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    for t in ("gan", "lsgan", "ragan"):
        dtx = make_d_optimizer({"lr_D": 1e-4}, multistep_restart(1e-4, []))
        dstate = init_state(dspec.init(jax.random.PRNGKey(0)), dtx)
        dstate, m = make_d_step(dspec.apply, dtx, t)(dstate, real, fake)
        assert jnp.isfinite(m["l_d_real"]) and jnp.isfinite(m["l_d_fake"])


def test_pixel_step_stabilizers():
    """Config-gated + stabilizers: pixel warmup ramp scales the loss from 0,
    reverse_grad_clip bounds the gradient norm (documented deviations,
    BENCHMARKS.md 'HCFlow+ fine-tune')."""
    import jax
    import jax.numpy as jnp
    import optax

    from hcflow_tpu.train import init_state, make_optimizer
    from hcflow_tpu.train.trainer import make_sr_pixel_step
    from hcflow_tpu.train.losses import l1

    model = tiny_sr_model()
    tx = make_optimizer({"beta1": 0.9, "beta2": 0.99}, lambda s: 0.0)  # lr 0
    params = model.init(jax.random.PRNGKey(0))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3))

    base = make_sr_pixel_step(model, tx, 1.0, l1)
    ramp = make_sr_pixel_step(model, tx, 1.0, l1, warmup_steps=100,
                              warmup_start=0)

    def fresh(step=0):  # the steps donate their state arg: rebuild each call
        st = init_state(jax.tree.map(jnp.array, params), tx)
        return st.replace(step=jnp.asarray(step, jnp.int32))

    _, m0 = base(fresh(), jax.random.PRNGKey(3), hr, lr)
    _, mr = ramp(fresh(), jax.random.PRNGKey(3), hr, lr)
    assert float(mr["l_g_pix_hr"]) == 0.0  # step 0 of the ramp
    _, mh = ramp(fresh(50), jax.random.PRNGKey(3), hr, lr)
    np.testing.assert_allclose(float(mh["l_g_pix_hr"]),
                               0.5 * float(m0["l_g_pix_hr"]), rtol=1e-5)
    _, mf = ramp(fresh(1000), jax.random.PRNGKey(3), hr, lr)
    np.testing.assert_allclose(float(mf["l_g_pix_hr"]), float(m0["l_g_pix_hr"]),
                               rtol=1e-5)

    # reverse_grad_clip: with a real lr, the clipped update differs and the
    # clipping function itself bounds the norm
    from hcflow_tpu.train.trainer import _clip_global_norm

    grads = {"a": jnp.full((10,), 3.0)}
    clipped = _clip_global_norm(grads, 1.0)
    np.testing.assert_allclose(float(optax.global_norm(clipped)), 1.0, rtol=1e-5)
    small = {"a": jnp.full((10,), 1e-3)}
    np.testing.assert_allclose(np.asarray(_clip_global_norm(small, 1.0)["a"]),
                               np.asarray(small["a"]), rtol=1e-6)
