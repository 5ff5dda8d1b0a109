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


def test_kernel_compiles_probe_classification(monkeypatch):
    """kernel_compiles: validated shapes skip the probe; scoped-VMEM failures are
    cached as definitive; infra failures fall back WITHOUT caching (retryable)."""
    from hcflow_tpu.ops import pallas_rdb as pr

    monkeypatch.setattr(pr.jax, "default_backend", lambda: "tpu")

    # validated shipped shape: no probe, True (80x80 -> Np 6400)
    spec_ok = pr.RDBSpec(nf=64, gc=32, H=80, W=80, compute_dtype="bfloat16")
    monkeypatch.setattr(pr, "_build_call", lambda *a: (_ for _ in ()).throw(
        AssertionError("validated shape must not probe")))
    assert pr.kernel_compiles(spec_ok)

    calls = {"n": 0}

    def boom(msg):
        def _build(*a):
            calls["n"] += 1
            raise RuntimeError(msg)
        return _build

    # scoped-VMEM failure: definitive False, cached (second call doesn't probe)
    spec_v = pr.RDBSpec(nf=64, gc=32, H=64, W=64, compute_dtype="bfloat16")
    pr._PROBE_CACHE.clear()
    monkeypatch.setattr(pr, "_build_call",
                        boom("Ran out of memory in memory space vmem"))
    assert not pr.kernel_compiles(spec_v)
    assert not pr.kernel_compiles(spec_v)
    assert calls["n"] == 1

    # infra failure: False but NOT cached (second call re-probes)
    spec_i = pr.RDBSpec(nf=64, gc=32, H=48, W=48, compute_dtype="bfloat16")
    calls["n"] = 0
    monkeypatch.setattr(pr, "_build_call", boom("Connection refused"))
    assert not pr.kernel_compiles(spec_i)
    assert not pr.kernel_compiles(spec_i)
    assert calls["n"] == 2
    pr._PROBE_CACHE.clear()
