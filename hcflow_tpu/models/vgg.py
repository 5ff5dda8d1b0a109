"""VGG19 feature extractor for the perceptual loss (HCFlow++ / LPIPS-style eval).

Behavioral reference: /root/reference/codes/models/modules/discriminator_vgg_arch.py:
130-156 (torchvision vgg19 features up to layer 34 = conv5_4 pre-activation, ImageNet
input normalization, frozen).

Pretrained ImageNet weights cannot be downloaded in this environment (zero egress), so
this module ships the architecture plus converters: point ``load_npz`` at a converted
weight file, or ``convert_torch_state_dict`` at a torchvision vgg19 state_dict.  The
feature loss is gated on weights being available.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nets import conv2d

# VGG19 cfg 'E' conv channel plan per block
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512), (512, 512, 512, 512))

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class VGG19FeatureSpec:
    """Features through conv5_4 (pre-ReLU), matching feature_layer=34."""

    feature_layer: int = 34
    use_input_norm: bool = True

    def conv_names(self):
        names = []
        for b, chans in enumerate(_BLOCKS):
            for c in range(len(chans)):
                names.append(f"conv{b + 1}_{c + 1}")
        return names

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Random init (architecture only — use converted pretrained weights)."""
        params = {}
        cin = 3
        i = 0
        keys = jax.random.split(key, 16)
        for b, chans in enumerate(_BLOCKS):
            for c, cout in enumerate(chans):
                params[f"conv{b + 1}_{c + 1}"] = {
                    "w": jax.random.normal(keys[i], (3, 3, cin, cout), dtype) * 0.02,
                    "b": jnp.zeros((cout,), dtype),
                }
                cin = cout
                i += 1
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: NHWC in [0,1]. Returns conv5_4 pre-activation features."""
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        # torchvision feature indices walk conv/relu/pool; we stop at the conv that
        # corresponds to self.feature_layer (34 => conv5_4, no trailing relu).
        idx = 0
        for b, chans in enumerate(_BLOCKS):
            for c in range(len(chans)):
                p = params[f"conv{b + 1}_{c + 1}"]
                x = conv2d(x, p["w"], p["b"])
                if idx == self.feature_layer:
                    return x
                x = jax.nn.relu(x)
                idx += 2
            # max pool 2x2 stride 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            idx += 1
        return x


def random_features(seed: int = 0) -> dict:
    """Deterministic He-initialized random VGG19 features — the documented
    perceptual-loss substitute when pretrained weights are unavailable.

    Randomly-weighted convnet features are an established perceptual
    representation (He, Wang & Hopcroft, "A Powerful Generative Model Using
    Random Weights for the Deep Image Representation", NeurIPS 2016; Ulyanov et
    al., "Deep Image Prior", CVPR 2018): the multi-scale conv+ReLU structure —
    not the learned filters — supplies most of the metric's sensitivity to
    texture and structure.  Weaker than ImageNet-pretrained conv5_4 features but
    a functional training signal; He init (std = sqrt(2/fan_in)) keeps
    activation variance stable through all 16 conv layers.
    """
    spec = VGG19FeatureSpec()
    params = spec.init(jax.random.PRNGKey(seed))
    out = {}
    for name, p in params.items():
        fan_in = p["w"].shape[0] * p["w"].shape[1] * p["w"].shape[2]
        std = float(np.sqrt(2.0 / fan_in))
        out[name] = {"w": p["w"] / 0.02 * std, "b": p["b"]}
    return out


def convert_torch_state_dict(sd) -> dict:
    """torchvision vgg19().features state_dict -> pytree (keys 'features.<i>.weight')."""
    spec = VGG19FeatureSpec()
    params = {}
    torch_idx = 0
    for b, chans in enumerate(_BLOCKS):
        for c in range(len(chans)):
            w = np.asarray(sd[f"features.{torch_idx}.weight"])
            bias = np.asarray(sd[f"features.{torch_idx}.bias"])
            params[f"conv{b + 1}_{c + 1}"] = {
                "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "b": jnp.asarray(bias),
            }
            torch_idx += 2  # conv + relu
        torch_idx += 1  # pool
    return params


def load_npz(path: str) -> Optional[dict]:
    """Load converted VGG weights saved via ``save_npz``; None if missing."""
    try:
        data = np.load(path)
    except (FileNotFoundError, OSError):
        return None
    params = {}
    for k in data.files:
        name, leaf = k.rsplit("/", 1)
        params.setdefault(name, {})[leaf] = jnp.asarray(data[k])
    return params


def save_npz(path: str, params: dict) -> None:
    flat = {f"{name}/{leaf}": np.asarray(v) for name, sub in params.items() for leaf, v in sub.items()}
    np.savez(path, **flat)
