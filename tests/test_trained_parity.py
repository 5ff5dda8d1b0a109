"""Trained-weight parity: the PyTorch reference trained for real (CPU, reduced
topology — tools/train_reference_ckpt.py) vs this framework with the converted
checkpoint, at max-norm tolerance and 0.01 dB on the full eval protocol.

This is the strongest in-environment proxy for the released-checkpoint north star
(BASELINE.json): unlike the random-weight parity tests it exercises *trained*
actnorm statistics, invconv matrices and coupling nets, plus the production
checkpoint-loading path end-to-end (utils/convert.load_reference_checkpoint).
Reference eval protocol being matched: codes/test_HCFlow.py:175-240 (per-image
NLL / PSNR / SSIM at heat 0).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_DIR = os.path.join(REPO, "weights", "ref_trained")
REF = "/root/reference/codes"


def _setup_ref():
    for name in ("lmdb",):
        sys.modules.setdefault(name, types.ModuleType(name))
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


def _find_ckpt():
    if not os.path.isdir(CKPT_DIR):
        return None, None
    pths = sorted(f for f in os.listdir(CKPT_DIR) if f.endswith("_G.pth"))
    yml = os.path.join(CKPT_DIR, "tiny_x4_parity.yml")
    if not pths or not os.path.isfile(yml):
        return None, None
    return os.path.join(CKPT_DIR, pths[-1]), yml


@pytest.mark.slow
def test_trained_checkpoint_parity():
    pth, yml = _find_ckpt()
    if pth is None:
        pytest.skip(
            "no trained reference checkpoint; run tools/train_reference_ckpt.py"
        )
    _setup_ref()
    import yaml as _yaml

    import jax
    import jax.numpy as jnp

    from models.modules.HCFlowNet_SR_arch import HCFlowNet_SR

    from hcflow_tpu.data.imresize import imresize
    from hcflow_tpu.data.util import modcrop, read_img, scan_images
    from hcflow_tpu.utils import config as config_mod
    from hcflow_tpu.utils.checkpoint import load_any
    from hcflow_tpu.utils.metrics import calculate_psnr_ssim

    topt = _yaml.safe_load(open(yml))
    scale = topt["scale"]

    # ----- reference net with the TRAINED weights through its own loading path
    ref_opt = {
        "quant": topt["quant"],
        "scale": scale,
        "datasets": {"train": {"GT_size": topt["datasets"]["train"]["GT_size"]}},
        "network_G": {**topt["network_G"], "scale": scale},
    }
    net = HCFlowNet_SR(ref_opt)
    sd = torch.load(pth, map_location="cpu")
    net.load_state_dict(sd, strict=True)
    for m in net.modules():
        if hasattr(m, "inited"):
            m.inited = True  # HCFlow_SR_model.py:462-465 (set_actnorm_init on load)
    net.eval()

    # ----- this framework: spec from the SAME yml + production .pth conversion
    opt = {"model": topt["model"], "scale": scale, "quant": topt["quant"],
           "network_G": topt["network_G"]}
    spec = config_mod.model_spec_from_opt(opt)
    params = load_any(pth, spec.flow)  # cli-serving loading path

    # ----- eval protocol on the bundled faces (MATLAB-bicubic LR, modcrop)
    paths = scan_images("/root/reference/datasets/example_face_8X/HR")
    rows = []
    fwd = jax.jit(lambda p, hr, lr, z: spec.forward(p, None, hr, lr, noise=z))
    rev = jax.jit(lambda p, k, lr: spec.reverse(p, k, lr, 0.0))
    for img_path in paths:
        hr = modcrop(read_img(img_path), scale)
        lr = np.clip(imresize(hr, 1.0 / scale), 0, 1).astype(np.float32)
        hr_t = torch.from_numpy(hr.transpose(2, 0, 1))[None]
        lr_t = torch.from_numpy(lr.transpose(2, 0, 1))[None]

        # zero dequant noise on both sides -> deterministic NLL
        real_rand = torch.rand
        torch.rand = (lambda *a, **k: torch.zeros(a[0]) if a and
                      isinstance(a[0], torch.Size) else torch.zeros(*a))
        try:
            with torch.no_grad():
                fake_lr_t, nll_t = net(hr=hr_t, lr=lr_t, reverse=False,
                                       training=False)
                sr_t = net(lr=lr_t, eps_std=0.0, reverse=True, training=False)
        finally:
            torch.rand = real_rand

        fake_lr_j, nll_j = fwd(params, jnp.asarray(hr[None]), jnp.asarray(lr[None]),
                               jnp.zeros((1,) + hr.shape))
        sr_j = rev(params, jax.random.PRNGKey(0), jnp.asarray(lr[None]))

        sr_j_np = np.asarray(sr_j[0])
        sr_t_np = np.clip(sr_t[0].numpy().transpose(1, 2, 0), 0, 1)

        # trained flows are well-conditioned: NLL tight, SR at MAX-NORM tolerance
        np.testing.assert_allclose(float(nll_j), float(nll_t.mean()), rtol=5e-4)
        # fake LR is quantized to the 1/255 grid (STE): fp noise at a rounding
        # tie may flip isolated elements by exactly one level — allow that only
        d_lr = np.abs(np.asarray(fake_lr_j[0])
                      - fake_lr_t[0].numpy().transpose(1, 2, 0))
        assert d_lr.max() <= 1.0 / 255 + 2e-4, d_lr.max()
        assert (d_lr > 2e-4).mean() <= 5e-3, (d_lr > 2e-4).mean()
        max_diff = float(np.max(np.abs(sr_j_np - sr_t_np)))
        assert max_diff <= 2e-3, f"{img_path}: SR max-norm diff {max_diff}"

        ours = calculate_psnr_ssim(sr_j_np, hr, crop_border=scale)
        theirs = calculate_psnr_ssim(sr_t_np, hr, crop_border=scale)
        assert abs(ours[0] - theirs[0]) <= 0.01, (img_path, ours[0], theirs[0])
        assert abs(ours[2] - theirs[2]) <= 0.01, (img_path, ours[2], theirs[2])
        rows.append((os.path.basename(img_path), float(nll_j), ours[0], theirs[0],
                     max_diff))

    assert len(rows) >= 6  # the whole bundled face set
    print("\ntrained-weight parity (PSNR ours vs torch, SR max-norm):")
    for name, nll, p_ours, p_ref, md in rows:
        print(f"  {name}: nll={nll:.4f} psnr {p_ours:.4f}/{p_ref:.4f} max|d|={md:.1e}")
