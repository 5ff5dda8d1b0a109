"""Parity for the env-gated kernel variants the on-chip sweep exercises.

tools/sweep_rdb_kernel.sh benches HCFLOW_RDB_SPLIT=src, HCFLOW_RDB_MM=<n> and
HCFLOW_CHAIN_C1STACK=1 on silicon; each sweep slot costs ~10 min of chip time
(remote Pallas compiles), so every variant must be proven correct on the CPU
interpreter first.  The flags are module globals read at pack/trace time —
tests patch them and clear the lru-cached pallas_call builders around each run.

Round-4 sweep verdicts (BENCHMARKS.md): both variants are measured on-chip
NEGATIVES — `src` trips the scoped-VMEM non-monotonicity at 80x80 (probe
fallback, 4.7 MP/s) and `C1STACK` hits an unimplemented Mosaic concat of
offset-laden rolled taps.  These interpreter parity tests stay: they pin the
variants' MATH so the negative results remain attributable to the backend,
not to a silent algebra bug in the variant paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.flow import stack
from hcflow_tpu.flow.flowstep import FlowStepSpec
from hcflow_tpu.ops import nets
from hcflow_tpu.ops import pallas_chain as pc
from hcflow_tpu.ops import pallas_rdb as pr


@pytest.fixture
def fresh_builds():
    """Clear the cached pallas_call builders before and after a patched run
    (the cache key is (spec, B, interpret) and does not see the globals)."""
    pc._build_call.cache_clear()
    pr._build_call.cache_clear()
    yield
    pc._build_call.cache_clear()
    pr._build_call.cache_clear()


def _randomized_trunk(nb, nf, gc, key=0):
    trunk = nets.init_rrdb_trunk(jax.random.PRNGKey(key), nb, nf, gc)
    leaves, td = jax.tree.flatten(trunk)
    ks = jax.random.split(jax.random.PRNGKey(key + 1), len(leaves))
    return jax.tree.unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, ks)]
    )


@pytest.mark.parametrize(
    "split,mm", [("src", 0), ("src", 16), ("src", 128), ("rdb", 16), ("rdb", 64)]
)
def test_rdb_variant_matches_xla(monkeypatch, fresh_builds, split, mm):
    monkeypatch.setattr(pr, "_SPLIT", split)
    monkeypatch.setattr(pr, "_MM_ENV", mm)
    nf, gc, H, W = 64, 32, 5, 7
    trunk = _randomized_trunk(2, nf, gc)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, nf))
    ref = nets.apply_rrdb_trunk(trunk, x)
    spec = pr.RDBSpec(nf=nf, gc=gc, H=H, W=W)
    packed = pr.pack_rrdb_trunk(spec, trunk)
    out = pr.trunk_apply(spec, packed, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nb", [1, 3])
def test_rdb_resident_trunk_matches_xla(monkeypatch, fresh_builds, nb):
    """Resident-trunk mode (HCFLOW_RDB_TRUNK=1): one pallas_call per trunk with
    carries in scratch across all RRDBs + streamed weight blocks must match the
    XLA trunk oracle; the stacked pack must also slice back to per-RRDB parity
    (the probe-failure fallback path)."""
    monkeypatch.setattr(pr, "_TRUNK", True)
    pr._build_call_trunk.cache_clear()
    nf, gc, H, W = 64, 32, 5, 7
    trunk = _randomized_trunk(nb, nf, gc)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, nf))
    ref = nets.apply_rrdb_trunk(trunk, x)
    spec = pr.RDBSpec(nf=nf, gc=gc, H=H, W=W)
    packed = pr.pack_rrdb_trunk(spec, trunk)
    assert isinstance(packed, dict) and packed["b"].shape[0] == nb * 3
    out = pr.trunk_apply(spec, packed, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # fallback path: per-RRDB slices of the stacked pack
    sliced = [
        {k: packed[k][3 * i : 3 * (i + 1)] for k in pr._PACK_KEYS} for i in range(nb)
    ]
    out2 = pr.trunk_apply(spec, sliced, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=2e-5, atol=2e-5)
    pr._build_call_trunk.cache_clear()


@pytest.mark.parametrize("cond", [False, True])
def test_chain_c1stack_matches_xla(monkeypatch, fresh_builds, cond):
    monkeypatch.setattr(pc, "_C1STACK", True)
    c, K, H, W, hidden = 12, 2, 6, 6, 8
    cond_ch = 16 if cond else None
    spec = FlowStepSpec(in_channels=c, cond_channels=cond_ch, hidden_channels=hidden)
    stacked = stack.init_stack(spec, jax.random.PRNGKey(0), K)
    leaves, td = jax.tree.flatten(stacked)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    stacked = jax.tree.unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, ks)]
    )
    stacked = stack._augment_invconv(stacked, need_inv=True, need_logdet=True)
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
