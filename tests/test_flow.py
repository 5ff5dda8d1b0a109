"""Flow-graph tests: scan/loop equivalence, round-trips, model-level invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.flow import stack
from hcflow_tpu.flow.conditional import ConditionalFlowSpec
from hcflow_tpu.flow.flownet import FlowNetSpec
from hcflow_tpu.flow.flowstep import FlowStepSpec
from hcflow_tpu.models.hcflow_sr import HCFlowSRSpec

KEY = jax.random.PRNGKey(0)

TINY_SR = dict(
    L=2, K=(3, 3), after_splitoff=(1, 1), hidden_channels=8,
    so_hidden_channels=8, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
)


def _randomized(params, key, scale=0.05):
    return jax.tree.map(lambda a: a + scale * jax.random.normal(key, a.shape), params)


# ----------------------------------------------------------------- step stacking
def test_stack_scan_matches_python_loop():
    spec = FlowStepSpec(in_channels=8, hidden_channels=8)
    stacked = stack.init_stack(spec, KEY, 4)
    stacked = _randomized(stacked, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8))
    ld = jnp.zeros((2,))
    y_scan, ld_scan = stack.forward_stack(spec, stacked, x, None, ld)

    z, l = x, ld
    for i in range(4):
        z, l = spec.forward(stack.unstack(stacked, i), z, None, l)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(z), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_scan), np.asarray(l), rtol=1e-5, atol=1e-4)


def test_stack_roundtrip():
    spec = FlowStepSpec(in_channels=8, hidden_channels=8)
    stacked = stack.init_stack(spec, KEY, 4)
    stacked = _randomized(stacked, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8))
    ld = jnp.zeros((2,))
    y, ldf = stack.forward_stack(spec, stacked, x, None, ld)
    x2, ld2 = stack.inverse_stack(spec, stacked, y, None, ldf)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_calibrate_stack_normalizes_first_actnorm():
    spec = FlowStepSpec(in_channels=8, hidden_channels=8)
    stacked = stack.init_stack(spec, KEY, 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 6, 8)) * 2.0 + 1.0
    new, z, ld = stack.calibrate_stack(spec, stacked, x, None, jnp.zeros((4,)))
    # first step's actnorm output should be normalized on the calibration batch
    p0 = stack.unstack(new, 0)
    from hcflow_tpu.ops import actnorm

    y, _ = actnorm.forward(p0["actnorm"], x)
    np.testing.assert_allclose(jnp.mean(y, axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(jnp.var(y, axis=(0, 1, 2)), 1.0, rtol=1e-2)
    assert jnp.all(jnp.isfinite(z)) and jnp.all(jnp.isfinite(ld))


# --------------------------------------------------------------- conditional flow
def test_condflow_shapes_and_determinism():
    spec = ConditionalFlowSpec(
        num_channels=12, num_channels_split=6, n_flow_step=2, num_levels_condition=0,
        sr=True, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, hidden_channels=8,
    )
    p = spec.init(KEY)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 6))
    u = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 6))
    ld, cond = spec.forward(p, a, u, jnp.zeros((2,)))
    assert ld.shape == (2,) and cond.shape == (2, 4, 4, 16)
    # eps_std=0 reverse is deterministic regardless of key
    a1, _ = spec.reverse(p, jax.random.PRNGKey(3), u, 0.0)
    a2, _ = spec.reverse(p, jax.random.PRNGKey(4), u, 0.0)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=0)


# ---------------------------------------------------------------------- flow net
@pytest.mark.parametrize("L,hw", [(2, 16), (3, 16)])
def test_flownet_shapes(L, hw):
    cfg = dict(TINY_SR)
    cfg.update(L=L, K=(3,) * L, after_splitoff=(1,) * L)
    spec = FlowNetSpec(**cfg)
    p = spec.init(KEY)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, hw, hw, 3))
    z, ld = spec.normal_flow(p, hr, jnp.zeros((2,)))
    s = 2**L
    assert z.shape == (2, hw // s, hw // s, 3)
    assert ld.shape == (2,)
    hr2 = spec.reverse_flow(p, jax.random.PRNGKey(2), z, 0.0)
    assert hr2.shape == hr.shape


def test_flownet_main_steps_invertible():
    """Full-level invertibility: reverse(concat(y, a)) recovers the squeezed input."""
    spec = FlowNetSpec(**TINY_SR)
    p = spec.init(KEY)
    p = _randomized(p, jax.random.PRNGKey(9), 0.02)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))

    from hcflow_tpu.ops.squeeze import squeeze2d, unsqueeze2d

    lv = spec.levels[0]
    z0 = squeeze2d(hr)
    z1, _ = spec._main_forward(lv, p["level0"]["main"], z0, jnp.zeros((1,)))
    z0b, _ = spec._main_inverse(lv, p["level0"], z1, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(z0b), np.asarray(z0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(unsqueeze2d(z0)), np.asarray(hr), atol=1e-6)


# ------------------------------------------------------------------- model level
def test_hcflow_sr_model_nll_and_reverse():
    model = HCFlowSRSpec(flow=FlowNetSpec(**TINY_SR), quant=64)
    p = model.init(KEY)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3))
    p = model.calibrate(p, jax.random.PRNGKey(3), hr, lr)
    fake_lr, nll = jax.jit(model.forward)(p, jax.random.PRNGKey(4), hr, lr)
    assert fake_lr.shape == lr.shape
    assert jnp.isfinite(nll)
    assert float(jnp.min(fake_lr)) >= 0.0 and float(jnp.max(fake_lr)) <= 1.0

    sr = jax.jit(lambda p, k, l, e: model.reverse(p, k, l, e))(
        p, jax.random.PRNGKey(5), lr, 0.8
    )
    assert sr.shape == hr.shape
    assert float(jnp.min(sr)) >= 0.0 and float(jnp.max(sr)) <= 1.0


def test_hcflow_sr_grad_flows():
    model = HCFlowSRSpec(flow=FlowNetSpec(**TINY_SR), quant=64)
    p = model.init(KEY)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3))

    def loss(params):
        _, nll = model.forward(params, jax.random.PRNGKey(4), hr, lr)
        return nll

    g = jax.grad(loss)(p)
    flat = jax.tree.leaves(g)
    assert all(jnp.all(jnp.isfinite(x)) for x in flat)
    # at least the prior head and actnorms receive gradient
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)


def test_hoisted_cond_steps_match_plain():
    """The hoisted-cond scan (one wide conv) must equal the per-step path."""
    spec = FlowStepSpec(in_channels=6, cond_channels=16, hidden_channels=8)
    stacked = stack.init_stack(spec, KEY, 4)
    stacked = _randomized(stacked, jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 6))
    u = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
    ld = jnp.zeros((2,))
    y_a, ld_a = stack.forward_stack(spec, stacked, z, u, ld)
    y_b, ld_b = stack.forward_stack_hoisted(spec, stacked, z, u, ld)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld_a), rtol=1e-5, atol=1e-4)
    x_a, _ = stack.inverse_stack(spec, stacked, y_a, u, ld)
    x_b, _ = stack.inverse_stack_hoisted(spec, stacked, y_a, u, ld)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(z), rtol=1e-4, atol=1e-4)


def test_encode_decode_roundtrip():
    """encode -> reverse_flow(eps_list=...) must reconstruct the input exactly."""
    spec = FlowNetSpec(**TINY_SR)
    p = spec.init(KEY)
    p = _randomized(p, jax.random.PRNGKey(9), 0.02)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    z, eps = spec.encode(p, hr)
    assert z.shape == (2, 4, 4, 3) and len(eps) == 2
    hr_rec = spec.reverse_flow(p, jax.random.PRNGKey(0), z, 0.0, eps_list=eps)
    np.testing.assert_allclose(np.asarray(hr_rec), np.asarray(hr), rtol=1e-3, atol=1e-3)
