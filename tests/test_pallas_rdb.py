"""Fused RRDB Pallas kernel vs the XLA scatter-RDB oracle (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.ops import nets
from hcflow_tpu.ops import pallas_rdb as pr


def _randomized_trunk(nb, nf, gc, key=0):
    trunk = nets.init_rrdb_trunk(jax.random.PRNGKey(key), nb, nf, gc)
    leaves, td = jax.tree.flatten(trunk)
    ks = jax.random.split(jax.random.PRNGKey(key + 1), len(leaves))
    return jax.tree.unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, ks)]
    )


@pytest.mark.parametrize(
    "nf,gc,H,W",
    [
        (64, 32, 6, 6),
        (64, 32, 5, 7),  # non-square, non-128-multiple N
        (16, 8, 6, 6),  # rescaling-scale trunk (gc=16-ish shapes)
    ],
)
def test_fused_rrdb_trunk_matches_xla(nf, gc, H, W):
    trunk = _randomized_trunk(2, nf, gc)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, nf))
    ref = nets.apply_rrdb_trunk(trunk, x)
    spec = pr.RDBSpec(nf=nf, gc=gc, H=H, W=W)
    packed = pr.pack_rrdb_trunk(spec, trunk)
    out = pr.trunk_apply(spec, packed, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_vmem_gate_fires_for_huge_spatial():
    huge = pr.RDBSpec(nf=64, gc=32, H=512, W=512, compute_dtype="bfloat16")
    assert huge.vmem_estimate() > pr.VMEM_BUDGET
