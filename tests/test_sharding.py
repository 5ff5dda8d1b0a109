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
