"""Torch-parity for the perceptual stacks' converters and forward passes.

Pretrained VGG19/LPIPS weights cannot be downloaded in this environment, but the
CONVERTER + JAX network math can be proven exactly: build the torch reference
networks (torchvision layer layout and state_dict naming — vgg.py cites
torchvision vgg19 features, lpips.py cites lpips.LPIPS(net='alex')) with random
weights, convert the state_dicts through the production converters, and assert
the JAX forward matches the torch forward.  With this green, dropping in real
pretrained files is a pure data operation.

Reference behavior being matched: codes/models/modules/loss.py VGGFeatureExtractor
(feature_layer=34, use_input_norm) and the official lpips package's alex variant
(codes/test_HCFlow.py:48,132).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _torch_vgg19_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU())
            cin = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    m = VGG()
    for p in m.parameters():
        p.requires_grad_(False)
    return m


def test_vgg19_feature_extractor_matches_torch():
    from hcflow_tpu.models.vgg import VGG19FeatureSpec, convert_torch_state_dict

    torch.manual_seed(0)
    m = _torch_vgg19_features()
    spec = VGG19FeatureSpec()  # feature_layer=34 (conv5_4 pre-activation)
    params = convert_torch_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )

    rng = np.random.default_rng(1)
    x = rng.random((2, 64, 64, 3), np.float32)

    got = np.asarray(spec.apply(params, jnp.asarray(x)), np.float32)

    # torch forward: same ImageNet normalization, stop AT index 34 (inclusive)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    t = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    with torch.no_grad():
        for i, layer in enumerate(m.features):
            t = layer(t)
            if i == 34:
                break
    want = t.permute(0, 2, 3, 1).numpy()

    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-8
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


class _TorchLPIPS(nn.Module):
    """lpips.LPIPS(net='alex') layout: net.features.<idx> convs + lin<i>.model.1."""

    def __init__(self):
        super().__init__()
        feats = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
        )

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.features = feats

        self.net = Net()
        for i, c in enumerate((64, 192, 384, 256, 256)):
            lin = nn.Module()
            lin.model = nn.Sequential(nn.Dropout(), nn.Conv2d(c, 1, 1, bias=False))
            setattr(self, f"lin{i}", lin)


def test_lpips_distance_matches_torch():
    from hcflow_tpu.models import lpips as lp

    torch.manual_seed(0)
    m = _TorchLPIPS()
    # lpips lin weights are nonnegative in the released model
    with torch.no_grad():
        for i in range(5):
            w = getattr(m, f"lin{i}").model[1].weight
            w.abs_()
    params = lp.convert_lpips_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )

    rng = np.random.default_rng(2)
    a = (rng.random((2, 64, 64, 3), np.float32) * 2 - 1)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), -1, 1)

    got = np.asarray(lp.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))

    # torch replica of the official computation
    shift = torch.from_numpy(np.asarray(lp._SHIFT, np.float32)).view(1, 3, 1, 1)
    scale = torch.from_numpy(np.asarray(lp._SCALE, np.float32)).view(1, 3, 1, 1)

    def feats(x):
        t = (torch.from_numpy(x).permute(0, 3, 1, 2) - shift) / scale
        out = []
        for layer in m.net.features:
            t = layer(t)
            if isinstance(layer, nn.ReLU):
                out.append(t)
        return out

    with torch.no_grad():
        total = torch.zeros(a.shape[0])
        for i, (f0, f1) in enumerate(zip(feats(a), feats(b))):
            n0 = f0 / (f0.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1 / (f1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1) ** 2
            w = getattr(m, f"lin{i}").model[1].weight  # (1, C, 1, 1)
            total = total + (d * w[0, :, :, :].unsqueeze(0)).sum(1).mean((1, 2))
    want = total.numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
