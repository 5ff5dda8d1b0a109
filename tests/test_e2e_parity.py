"""End-to-end eval-stack parity: real image -> both frameworks -> both metric stacks.

The strongest offline check of the whole chain: load the bundled butterfly image,
bicubic-downscale it, run the reference PyTorch HCFlowNet_SR (random weights,
deterministic zero dequant noise) AND this framework with converted weights, and
assert that NLL, the generated LR, the eps_std=0 SR output, and the computed
PSNR/SSIM(+Y) metrics all agree.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"


def _setup_ref():
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


@pytest.mark.slow
def test_end_to_end_eval_parity():
    _setup_ref()
    import jax
    import jax.numpy as jnp
    from models.modules.HCFlowNet_SR_arch import HCFlowNet_SR

    from hcflow_tpu.data.imresize import imresize
    from hcflow_tpu.data.util import modcrop, read_img
    from hcflow_tpu.models.hcflow_sr import HCFlowSRSpec
    from hcflow_tpu.utils.convert import convert_flownet
    from hcflow_tpu.utils.metrics import calculate_psnr_ssim

    # ----- data: the bundled butterfly, modcropped, reference-faithful bicubic LR
    hr = modcrop(read_img("/root/reference/datasets/example_general_4X/HR/butterfly.png"), 4)
    hr = hr[:64, :64]  # keep the tiny test fast
    lr = np.clip(imresize(hr, 0.25), 0, 1)

    # ----- reference model (random weights, deterministic)
    opt = {
        "quant": 64,
        "scale": 4,
        "datasets": {"train": {"GT_size": 64}},
        "network_G": {
            "in_nc": 3,
            "flowDownsampler": {
                "K": 4, "L": 2, "flow_permutation": "invconv", "flow_coupling": "Affine",
                "nn_module": "FCN", "hidden_channels": 16, "cond_channels": None,
                "splitOff": {
                    "enable": True, "after_flowstep": [2, 2],
                    "flow_permutation": "invconv", "flow_coupling": "Affine",
                    "nn_module": "FCN", "hidden_channels": 16,
                    "RRDB_nb": [1, 1], "RRDB_nf": 8, "RRDB_gc": 4,
                },
            },
        },
    }
    net = HCFlowNet_SR(opt)
    g = torch.Generator().manual_seed(0)
    for name, p in net.named_parameters():
        if "permute.weight" in name:
            # invconv weights must stay well-conditioned or the inverse explodes
            q, _ = torch.linalg.qr(torch.randn(p.shape, generator=g))
            p.data = q
        else:
            p.data = torch.randn(p.shape, generator=g) * 0.03
    for m in net.modules():
        if hasattr(m, "inited"):
            m.inited = True
    net.eval()

    hr_t = torch.from_numpy(hr.transpose(2, 0, 1))[None]
    lr_t = torch.from_numpy(lr.transpose(2, 0, 1))[None]

    real_rand = torch.rand
    torch.rand = lambda *a, **k: torch.zeros(a[0]) if a and isinstance(a[0], torch.Size) \
        else torch.zeros(*a)
    try:
        with torch.no_grad():
            fake_lr_t, nll_t = net(hr=hr_t, lr=lr_t, reverse=False, training=False)
            sr_t = net(lr=lr_t, eps_std=0.0, reverse=True, training=False)
    finally:
        torch.rand = real_rand

    # ----- this framework with converted weights
    spec = HCFlowSRSpec.for_scale(
        4, K=(4, 4), after_splitoff=(2, 2), hidden_channels=16, so_hidden_channels=16,
        rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    )
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_flownet(sd, spec.flow, prefix="flow")

    key = jax.random.PRNGKey(0)
    fake_lr_j, nll_j = spec.forward(
        params, key, jnp.asarray(hr[None]), jnp.asarray(lr[None]),
        noise=jnp.zeros((1,) + hr.shape),
    )
    sr_j = spec.reverse(params, key, jnp.asarray(lr[None]), 0.0)

    # ----- agreement of model outputs
    np.testing.assert_allclose(float(nll_j), float(nll_t.mean()), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(fake_lr_j[0]),
        fake_lr_t[0].numpy().transpose(1, 2, 0),
        rtol=1e-3, atol=1e-3,
    )
    sr_j_np = np.asarray(sr_j[0])
    sr_t_np = sr_t[0].numpy().transpose(1, 2, 0)
    assert np.all(np.isfinite(sr_j_np)) and np.all(np.isfinite(sr_t_np))
    # clamped [0,1] outputs of a chaotic random-weight inverse: compare robustly
    assert np.mean(np.abs(sr_j_np - sr_t_np) <= 1e-2) > 0.98

    # ----- agreement of the metric stacks on identical inputs
    from utils.util import calculate_psnr_ssim as ref_metrics

    # reference metrics take BGR (tensor2img convention); ours take RGB
    ours = calculate_psnr_ssim(sr_j_np, hr, crop_border=4)
    theirs = ref_metrics(np.ascontiguousarray(sr_j_np[:, :, ::-1]).copy(), np.ascontiguousarray(hr[:, :, ::-1]).copy(), crop_border=4)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-6)  # PSNR
    np.testing.assert_allclose(ours[1], theirs[1], rtol=1e-4)  # SSIM
    np.testing.assert_allclose(ours[2], theirs[2], rtol=1e-4)  # PSNR_Y
    np.testing.assert_allclose(ours[3], theirs[3], rtol=1e-3)  # SSIM_Y
