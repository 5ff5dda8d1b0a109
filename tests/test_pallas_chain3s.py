"""Parity for the fused rescaling main-chain kernel (Affine3shift + DenseBlock).

The kernel (ops/pallas_chain3s.py) is env-gated (HCFLOW_CHAIN3S) and measured
on-chip by tools/bench_rescaling.py; these CPU-interpreter tests pin its math
against the unrolled XLA step loop — the training path and correctness oracle
(behavioral reference: FlowStep.py:53-64 + AffineCouplings.py:122-160 +
Basic.py:329-358 with flow_permutation "none").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.flow.flowstep import FlowStepSpec
from hcflow_tpu.ops import pallas_chain3s as p3


def _make_chain(c, K, gc, key=0):
    """Alternating Affine3shift/DenseBlock steps with randomized actnorm and
    conv5 (both zero at init, which would leave the inverse path untested)."""
    specs, params = [], []
    k0 = jax.random.PRNGKey(key)
    for k in range(K):
        ss = FlowStepSpec(
            in_channels=c, cond_channels=None, flow_permutation="none",
            flow_coupling="Affine3shift", nn_module="DenseBlock",
            hidden_channels=gc, lr_vs_others=(k % 2 == 0),
        )
        k0, ki, ka, kw, kb = jax.random.split(k0, 5)
        p = ss.init(ki)
        p["actnorm"] = {
            "bias": 0.3 * jax.random.normal(ka, (c,)),
            "logs": 0.1 * jax.random.normal(kw, (c,)),
        }
        f = p["coupling"]["f"]
        f["conv5"] = {
            "w": 0.05 * jax.random.normal(kb, f["conv5"]["w"].shape),
            "b": 0.05 * jax.random.normal(ka, f["conv5"]["b"].shape),
        }
        specs.append(ss)
        params.append(p)
    return specs, params


def _oracle_inverse(specs, params, z, logdet):
    for k in reversed(range(len(specs))):
        z, logdet = specs[k].inverse(params[k], z, None, logdet)
    return z, logdet


@pytest.mark.parametrize(
    "c,K,gc,H,W",
    [
        (12, 4, 16, 8, 8),   # level-0-like (even K: both parities x2)
        (48, 3, 32, 4, 6),   # level-1-like channels, odd K (n_even=2, n_odd=1)
    ],
)
def test_chain3s_matches_xla_loop(c, K, gc, H, W):
    specs, params = _make_chain(c, K, gc)
    z = jax.random.normal(jax.random.PRNGKey(9), (2, H, W, c))
    ld0 = jnp.zeros((2,))
    ref, ld_ref = _oracle_inverse(specs, params, z, ld0)

    spec = p3.Chain3sSpec(K=K, c=c, gc=gc, H=H, W=W)
    packed = p3.pack_inverse_chain3s(spec, params)
    out, ld_delta = p3.inverse_chain(spec, packed, z, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ld0 + ld_delta), np.asarray(ld_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_chain3s_fused_model_reverse_matches(monkeypatch):
    """End-to-end attachment: a tiny rescaling model's reverse with the fused
    main chains (HCFLOW_CHAIN3S path) matches the unfused reverse."""
    from hcflow_tpu.models import HCFlowRescalingSpec

    monkeypatch.setattr(p3, "ENABLED", True)
    model = HCFlowRescalingSpec.default_x4(
        K=(4, 4), after_splitoff=(2, 2), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=8,
        hidden_channels=8, so_hidden_channels=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    # perturb all leaves so zero-init conv5/actnorm don't mask layout bugs
    leaves, td = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(
        td, [l + 0.03 * jax.random.normal(k, l.shape) for l, k in zip(leaves, ks)]
    )
    key = jax.random.PRNGKey(1)
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))

    p_plain = model.flow.precompute_inference(params, fused=False)
    p_fused = model.flow.precompute_inference(params, fused=True)
    assert any(
        "main3s_fused" in p_fused[f"level{i}"] for i in range(model.flow.L)
    ), "fused pack was not attached"
    ref = model.reverse(p_plain, key, lr, 0.7)
    out = model.reverse(p_fused, key, lr, 0.7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
