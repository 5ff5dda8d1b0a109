"""Fused Pallas inverse-chain kernel vs the XLA scan oracle.

The XLA path (flow/stack.py) is the correctness reference; the fused kernel
(ops/pallas_chain.py) must reproduce it to f32 tolerance.  On CPU these run the
Pallas interpreter (slow — shapes kept tiny); the same comparisons run compiled on
the real chip via /tmp-level scripts and the bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.flow import stack
from hcflow_tpu.flow.flowstep import FlowStepSpec
from hcflow_tpu.models.hcflow_sr import HCFlowSRSpec
from hcflow_tpu.ops import pallas_chain as pc

TINY = dict(
    K=(3, 3), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    hidden_channels=8, so_hidden_channels=8,
)


def _randomized_stack(spec, K, key=0):
    stacked = stack.init_stack(spec, jax.random.PRNGKey(key), K)
    leaves, treedef = jax.tree.flatten(stacked)
    keys = jax.random.split(jax.random.PRNGKey(key + 1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    stacked = jax.tree.unflatten(treedef, leaves)
    return stack._augment_invconv(stacked, need_inv=True, need_logdet=True)


@pytest.mark.parametrize(
    "cond,c,K,H,W,hidden",
    [
        (False, 12, 2, 6, 6, 8),
        (True, 12, 2, 6, 6, 8),
        (False, 6, 2, 5, 7, 8),  # odd split + non-square spatial
        (True, 21, 2, 6, 6, 8),  # odd channel count (x4 level-1 cond shape)
    ],
)
def test_fused_chain_matches_xla(cond, c, K, H, W, hidden):
    cond_ch = 16 if cond else None
    spec = FlowStepSpec(in_channels=c, cond_channels=cond_ch, hidden_channels=hidden)
    stacked = _randomized_stack(spec, K)
    B = 2
    z = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, c))
    zeros = jnp.zeros((B,))
    if cond:
        u = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, cond_ch))
        ref, _ = stack.inverse_stack_hoisted(spec, stacked, z, u, zeros)
        uc = stack.compute_u_contribs(spec, stacked, u)
    else:
        ref, _ = stack.inverse_stack(spec, stacked, z, None, zeros)
        uc = None

    cs = pc.ChainSpec(K=K, c=c, hidden=hidden, H=H, W=W, cond=cond)
    packed = pc.pack_inverse_chain(cs, stacked)
    out = pc.inverse_chain(cs, packed, z, uc, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_model_reverse_matches():
    """Full model: precompute_inference(fused=True) == plain path on the reverse."""
    model = HCFlowSRSpec.for_scale(4, **TINY)
    p = model.init(jax.random.PRNGKey(0))
    p = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(9), a.shape), p
    )
    pp = model.flow.precompute_inference(p)
    pf = model.flow.precompute_inference(p, fused=True)
    # fused packing attached for every eligible chain
    assert "main_fused" in pf["level0"]
    assert "steps_fused" in pf["level0"]["cond"]

    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 4, 3))
    key = jax.random.PRNGKey(3)
    a = model.reverse(pp, key, lr, 0.7)
    b = model.reverse(pf, key, lr, 0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5)


def test_atan_matches_jnp():
    x = jnp.linspace(-30.0, 30.0, 4001)
    np.testing.assert_allclose(
        np.asarray(pc._atan(x)), np.arctan(np.asarray(x)), rtol=0, atol=2e-6
    )
