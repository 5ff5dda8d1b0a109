"""Activation-level parity vs the PyTorch reference (random weights, CPU).

These tests instantiate the original HCFlow modules from /root/reference (read-only),
randomize their weights, convert the state_dict with hcflow_tpu.utils.convert, and
assert that forward logdet / outputs and the deterministic (eps_std=0) reverse pass
match to float32 tolerance.  This is the strongest offline oracle available (released
checkpoints are not bundled), and exactly the mechanism that will load them.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with missing optional deps stubbed out."""
    if "natsort" not in sys.modules:
        m = types.ModuleType("natsort")
        m.natsorted = sorted
        sys.modules["natsort"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.modules.Basic as Basic
    import models.modules.ConditionalFlow as CF
    import models.modules.FlowNet_Rescaling_x4 as FNR
    import models.modules.FlowNet_SR_x4 as FN4
    import models.modules.FlowStep as FS

    return types.SimpleNamespace(Basic=Basic, FS=FS, CF=CF, FN4=FN4, FNR=FNR)


def randomize_(module, seed=0):
    """Randomize all trainable params (skips fixed Haar weights); marks actnorms inited."""
    g = torch.Generator().manual_seed(seed)
    for name, p in module.named_parameters():
        if "haar_weights" in name:
            continue
        p.data = torch.randn(p.shape, generator=g) * 0.1
    for m in module.modules():
        if hasattr(m, "inited"):
            m.inited = True


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def t2j(x):
    return np.ascontiguousarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


# ------------------------------------------------------------------------- FCN
def test_fcn_parity(ref):
    from hcflow_tpu.ops.nets import apply_fcn
    from hcflow_tpu.utils.convert import convert_fcn

    net = ref.Basic.FCN(in_channels=6, out_channels=8, hidden_channels=16)
    randomize_(net)
    net.eval()
    x = torch.randn(2, 6, 8, 8, generator=torch.Generator().manual_seed(1))
    want = net(x)
    got = apply_fcn(convert_fcn(sd_numpy(net), ""), t2j(x))
    # convert_fcn with empty prefix: keys look like '.conv1.weight'
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- FlowStep
def test_flowstep_parity(ref):
    from hcflow_tpu.flow.flowstep import FlowStepSpec

    from hcflow_tpu.utils.convert import convert_flowstep

    opt = {"hidden_channels": 16, "nn_module": "FCN"}
    net = ref.FS.FlowStep(in_channels=8, cond_channels=None, flow_permutation="invconv",
                          flow_coupling="Affine", opt=opt)
    randomize_(net)
    net.eval()
    spec = FlowStepSpec(in_channels=8, hidden_channels=16)
    params = convert_flowstep(sd_numpy(net), "", spec)

    x = torch.randn(2, 8, 8, 8, generator=torch.Generator().manual_seed(2))
    ld = torch.zeros(2)
    with torch.no_grad():
        y_t, ld_t = net(x, logdet=ld, reverse=False)
    import jax.numpy as jnp

    y_j, ld_j = spec.forward(params, jnp.asarray(t2j(x)), None, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y_j), t2j(y_t), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(), rtol=1e-4, atol=1e-3)

    with torch.no_grad():
        x_t, _ = net(y_t, reverse=True)
    x_j, _ = spec.inverse(params, y_j, None)
    np.testing.assert_allclose(np.asarray(x_j), t2j(x_t), rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------- ConditionalFlow
@pytest.mark.parametrize("sr", [True, False])
def test_condflow_parity(ref, sr):
    import jax
    import jax.numpy as jnp

    from hcflow_tpu.flow.conditional import ConditionalFlowSpec
    from hcflow_tpu.utils.convert import convert_condflow

    opt = {
        "flow_permutation": "invconv",
        "flow_coupling": "Affine",
        "nn_module": "FCN",
        "hidden_channels": 16,
        "RRDB_nb": [1, 1],
        "RRDB_nf": 8,
        "RRDB_gc": 4,
    }
    net = ref.CF.ConditionalFlow(
        num_channels=12, num_channels_split=6, n_flow_step=2, opt=opt,
        num_levels_condition=0, SR=sr,
    )
    randomize_(net)
    net.eval()
    spec = ConditionalFlowSpec(
        num_channels=12, num_channels_split=6, n_flow_step=2, num_levels_condition=0,
        sr=sr, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4, hidden_channels=16,
    )
    params = convert_condflow(sd_numpy(net), "", spec)

    g = torch.Generator().manual_seed(3)
    a = torch.randn(2, 6, 8, 8, generator=g)
    u = torch.randn(2, 6, 8, 8, generator=g)
    with torch.no_grad():
        if sr:
            ld_t, cond_t = net(a, u, logdet=torch.zeros(2), reverse=False)
        else:
            fz_t, cond_t = net(a, u, logdet=torch.zeros(2), reverse=False)

    out_j, cond_j = spec.forward(
        params, jnp.asarray(t2j(a)), jnp.asarray(t2j(u)), jnp.zeros((2,))
    )
    np.testing.assert_allclose(np.asarray(cond_j), t2j(cond_t), rtol=1e-4, atol=1e-4)
    if sr:
        np.testing.assert_allclose(np.asarray(out_j), ld_t.numpy(), rtol=1e-4, atol=1e-2)
    else:
        np.testing.assert_allclose(np.asarray(out_j), t2j(fz_t), rtol=1e-4, atol=1e-4)

    # deterministic reverse at eps_std = 0
    with torch.no_grad():
        if sr:
            a_t, _, _ = net(None, u, eps_std=0.0, reverse=True)
        else:
            a_t, _ = net(None, u, eps_std=0.0, reverse=True)
    a_j, _ = spec.reverse(params, jax.random.PRNGKey(0), jnp.asarray(t2j(u)), 0.0)
    np.testing.assert_allclose(np.asarray(a_j), t2j(a_t), rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- FlowNet SR x4
def make_sr_opt(K=4, L=2, after=(2, 2), hidden=16, nb=(1, 1), nf=8, gc=4):
    return {
        "network_G": {
            "flowDownsampler": {
                "K": K,
                "L": L,
                "flow_permutation": "invconv",
                "flow_coupling": "Affine",
                "nn_module": "FCN",
                "hidden_channels": hidden,
                "cond_channels": None,
                "squeeze": "checkerboard",
                "splitOff": {
                    "enable": True,
                    "after_flowstep": list(after),
                    "flow_permutation": "invconv",
                    "flow_coupling": "Affine",
                    "nn_module": "FCN",
                    "hidden_channels": hidden,
                    "RRDB_nb": list(nb),
                    "RRDB_nf": nf,
                    "RRDB_gc": gc,
                },
            }
        }
    }


@pytest.mark.slow
def test_flownet_sr_x4_parity(ref):
    import jax
    import jax.numpy as jnp

    from hcflow_tpu.flow.flownet import FlowNetSpec
    from hcflow_tpu.utils.convert import convert_flownet

    net = ref.FN4.FlowNet((16, 16, 3), opt=make_sr_opt())
    randomize_(net)
    net.eval()
    spec = FlowNetSpec(
        L=2, K=(4, 4), after_splitoff=(2, 2), hidden_channels=16,
        so_hidden_channels=16, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    )
    params = convert_flownet(sd_numpy(net), spec, prefix="")

    g = torch.Generator().manual_seed(4)
    hr = torch.rand(2, 3, 16, 16, generator=g)
    ld0 = torch.zeros(2)
    with torch.no_grad():
        z_t, ld_t = net(hr=hr, logdet=ld0, reverse=False)
    z_j, ld_j = spec.normal_flow(params, jnp.asarray(t2j(hr)), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(z_j), t2j(z_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(), rtol=1e-3, atol=5e-2)

    # deterministic reverse from the produced LR at eps_std=0
    with torch.no_grad():
        hr_t = net(z=z_t, eps_std=0.0, reverse=True)
    hr_j = spec.reverse_flow(params, jax.random.PRNGKey(0), z_j, 0.0)
    # Random (untrained) weights make deep stacked inverses chaotic (values can blow
    # up to ~1e3 or NaN identically in both frameworks); torch computes invconv
    # inverses in float64, we stay in f32, so isolated elements can diverge.  Require
    # 99.5% of (finite-in-both) elements within atol+rtol*|ref| instead of a max norm.
    got, want = np.asarray(hr_j), t2j(hr_t)
    both_nan = np.isnan(got) & np.isnan(want)
    ok = both_nan | (np.abs(got - want) <= 1e-3 + 1e-3 * np.abs(want))
    assert np.mean(ok) > 0.995, f"only {np.mean(ok):.4f} of elements match"


# --------------------------------------------------------- FlowNet Rescaling x4
@pytest.mark.slow
def test_flownet_rescaling_parity(ref):
    import jax
    import jax.numpy as jnp

    from hcflow_tpu.flow.flownet import FlowNetSpec
    from hcflow_tpu.utils.convert import convert_flownet

    opt = {
        "network_G": {
            "flowDownsampler": {
                "K": 4,
                "L": 2,
                "squeeze": "haar",
                "flow_permutation": "none",
                "flow_coupling": "Affine3shift",
                "nn_module": "DenseBlock",
                "hidden_channels": 8,
                "cond_channels": None,
                "splitOff": {
                    "enable": True,
                    "after_flowstep": [2, 2],
                    "flow_permutation": "invconv",
                    "flow_coupling": "Affine",
                    "nn_module": "FCN",
                    "hidden_channels": 16,
                    "RRDB_nb": [1, 1],
                    "RRDB_nf": 8,
                    "RRDB_gc": 4,
                },
            }
        }
    }
    net = ref.FNR.FlowNet((16, 16, 3), opt=opt)
    randomize_(net)
    net.eval()
    spec = FlowNetSpec(
        L=2, K=(4, 4), after_splitoff=(2, 2), squeeze="haar", flow_permutation="none",
        flow_coupling="Affine3shift", nn_module="DenseBlock", hidden_channels=8,
        sr=False, so_hidden_channels=16, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    )
    params = convert_flownet(sd_numpy(net), spec, prefix="")

    g = torch.Generator().manual_seed(5)
    hr = torch.rand(2, 3, 16, 16, generator=g)
    with torch.no_grad():
        z_t, fz1_t, fz2_t = net(hr=hr, logdet=None, reverse=False)
    z_j, fzs = spec.normal_flow(params, jnp.asarray(t2j(hr)), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(z_j), t2j(z_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fzs[0]), t2j(fz1_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fzs[1]), t2j(fz2_t), rtol=1e-4, atol=1e-4)

    with torch.no_grad():
        hr_t = net(z=z_t, eps_std=0.0, reverse=True)
    hr_j = spec.reverse_flow(params, jax.random.PRNGKey(0), z_j, 0.0)
    # Random (untrained) weights make deep stacked inverses chaotic (values can blow
    # up to ~1e3 or NaN identically in both frameworks); torch computes invconv
    # inverses in float64, we stay in f32, so isolated elements can diverge.  Require
    # 99.5% of (finite-in-both) elements within atol+rtol*|ref| instead of a max norm.
    got, want = np.asarray(hr_j), t2j(hr_t)
    both_nan = np.isnan(got) & np.isnan(want)
    ok = both_nan | (np.abs(got - want) <= 1e-3 + 1e-3 * np.abs(want))
    assert np.mean(ok) > 0.995, f"only {np.mean(ok):.4f} of elements match"


@pytest.mark.slow
def test_flownet_sr_x8_parity(ref):
    """L=3 hierarchy with 2-level conditioning concat (FlowNet_SR_x8)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from hcflow_tpu.flow.flownet import FlowNetSpec
    from hcflow_tpu.utils.convert import convert_flownet

    FN8 = importlib.import_module("models.modules.FlowNet_SR_x8")
    net = FN8.FlowNet((16, 16, 3), opt=make_sr_opt(K=3, L=3, after=(1, 1, 1)))
    randomize_(net)
    net.eval()
    spec = FlowNetSpec(
        L=3, K=(3, 3, 3), after_splitoff=(1, 1, 1), hidden_channels=16,
        so_hidden_channels=16, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    )
    params = convert_flownet(sd_numpy(net), spec, prefix="")

    g = torch.Generator().manual_seed(6)
    hr = torch.rand(2, 3, 16, 16, generator=g)
    with torch.no_grad():
        z_t, ld_t = net(hr=hr, logdet=torch.zeros(2), reverse=False)
    z_j, ld_j = spec.normal_flow(params, jnp.asarray(t2j(hr)), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(z_j), t2j(z_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(), rtol=1e-3, atol=5e-2)

    with torch.no_grad():
        hr_t = net(z=z_t, eps_std=0.0, reverse=True)
    hr_j = spec.reverse_flow(params, jax.random.PRNGKey(0), z_j, 0.0)
    got, want = np.asarray(hr_j), t2j(hr_t)
    both_nan = np.isnan(got) & np.isnan(want)
    ok = both_nan | (np.abs(got - want) <= 1e-3 + 1e-3 * np.abs(want))
    assert np.mean(ok) > 0.995, f"only {np.mean(ok):.4f} of elements match"


# ------------------------------------------------- heat>0 sampling parity (x4 SR)
@pytest.mark.parametrize("eps_std", [0.5, 0.9])
def test_reverse_sampling_parity_heat(ref, eps_std):
    """Temperature sampling parity: inject the SAME eps draws into the reference's
    GaussianDiag.sample path and our reverse_flow(eps_list=...) and require the SR
    outputs to agree.  This exercises the prior heads (mean/logs), the eps scaling
    z = mean + exp(logs)*eps_std*n, and the conditional inverse chains at heat>0 —
    the paper's headline sampling knob (reference ConditionalFlow.py:60-69,
    HCFlow_SR_model.py:353-370).  Both sides draw from an identical numpy stream in
    the same per-level order (deepest level first).
    """
    import jax
    import jax.numpy as jnp

    from hcflow_tpu.flow.flownet import FlowNetSpec
    from hcflow_tpu.utils.convert import convert_flownet

    net = ref.FN4.FlowNet((16, 16, 3), opt=make_sr_opt())
    # gentler randomization than randomize_: orthogonal invconv weights + 0.03-scale
    # elsewhere keep the heat>0 inverse numerically sane (finite outputs), so the
    # comparison is non-degenerate
    g = torch.Generator().manual_seed(7)
    for name, p in net.named_parameters():
        if "haar_weights" in name:
            continue
        if "permute.weight" in name:  # InvertibleConv1x1 weight (C, C)
            q, _ = torch.linalg.qr(torch.randn(p.shape[0], p.shape[1], generator=g))
            p.data = q.reshape(p.shape)
        else:
            p.data = torch.randn(p.shape, generator=g) * 0.03
    for m in net.modules():
        if hasattr(m, "inited"):
            m.inited = True
    net.eval()
    spec = FlowNetSpec(
        L=2, K=(4, 4), after_splitoff=(2, 2), hidden_channels=16,
        so_hidden_channels=16, rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    )
    params = convert_flownet(sd_numpy(net), spec, prefix="")

    g = torch.Generator().manual_seed(11)
    lr = torch.rand(2, 3, 4, 4, generator=g)

    # shared eps stream: reference consumes via a patched GaussianDiag.sample in
    # reverse level order (L-1 -> 0); we replay the identical draws per level.
    rs = np.random.RandomState(123)
    drawn = []

    def patched_sample(mean, logs, eps_std_arg=None):
        eps = rs.standard_normal(tuple(mean.shape)).astype(np.float32) * eps_std_arg
        drawn.append(eps)
        return mean + torch.exp(logs) * torch.from_numpy(eps)

    orig = ref.Basic.GaussianDiag.sample
    ref.Basic.GaussianDiag.sample = staticmethod(patched_sample)
    try:
        with torch.no_grad():
            hr_t = net(z=lr, eps_std=eps_std, reverse=True)
    finally:
        ref.Basic.GaussianDiag.sample = orig
    assert len(drawn) == 2  # one prior draw per level

    # eps_list is indexed by level (0 = outermost); torch drew deepest level first
    eps_list = [jnp.asarray(t2j(torch.from_numpy(e))) for e in reversed(drawn)]
    hr_j = spec.reverse_flow(
        params, jax.random.PRNGKey(0), jnp.asarray(t2j(lr)), eps_std,
        eps_list=eps_list,
    )
    got, want = np.asarray(hr_j), t2j(hr_t)
    assert np.isfinite(want).all(), "reference produced non-finite output"
    assert np.isfinite(got).all(), "ours produced non-finite output"
    ok = np.abs(got - want) <= 1e-3 + 1e-3 * np.abs(want)
    assert np.mean(ok) > 0.995, f"only {np.mean(ok):.4f} of elements match"
    # and the outputs are genuinely temperature-dependent (non-degenerate test)
    hr_j0 = spec.reverse_flow(params, jax.random.PRNGKey(0), jnp.asarray(t2j(lr)), 0.0)
    assert float(jnp.max(jnp.abs(hr_j - hr_j0))) > 1e-3
