"""Discriminators for GAN fine-tuning (HCFlow++).

Behavioral reference: /root/reference/codes/models/modules/discriminator_vgg_arch.py.
VGG-style strided conv stacks with BatchNorm + two FC heads (128/160-px variants differ
only in the flattened FC input size — here computed from the configured input size so
one implementation covers both), and a PatchGAN variant.

Functional NHWC implementation; BatchNorm uses current-batch statistics (training-mode
semantics — discriminators are train-only in this framework, and no D checkpoints are
released for the reference, so running-average state is unnecessary).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.nets import conv2d


def _bn_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _bn_apply(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _conv_init(key, cin, cout, k, bias, dtype=jnp.float32):
    # torch default conv init
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (k, k, cin, cout), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return p


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _conv_s2(x, w):
    """4x4 stride-2 conv with torch padding=1 (halves spatial dims)."""
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@dataclasses.dataclass(frozen=True)
class VGGDiscriminatorSpec:
    """discriminator_vgg_128 / discriminator_vgg_160 (input_size 128 or 160)."""

    input_size: int = 160
    in_nc: int = 3
    nf: int = 64

    @property
    def final_hw(self) -> int:
        hw = self.input_size
        for _ in range(5):
            hw = hw // 2
        return hw

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        nf = self.nf
        chans = [
            (self.in_nc, nf, True),  # conv0_0 (3x3, bias)
            (nf, nf, False),  # conv0_1 (4x4 s2)
            (nf, nf * 2, False),
            (nf * 2, nf * 2, False),
            (nf * 2, nf * 4, False),
            (nf * 4, nf * 4, False),
            (nf * 4, nf * 8, False),
            (nf * 8, nf * 8, False),
            (nf * 8, nf * 8, False),
            (nf * 8, nf * 8, False),
        ]
        keys = jax.random.split(key, len(chans) + 2)
        params = {}
        for i, (cin, cout, bias) in enumerate(chans):
            k = 3 if i % 2 == 0 else 4
            params[f"conv{i}"] = _conv_init(keys[i], cin, cout, k, bias, dtype)
            if i > 0:
                params[f"bn{i}"] = _bn_init(cout, dtype)
        fc_in = self.nf * 8 * self.final_hw * self.final_hw
        b1 = 1.0 / math.sqrt(fc_in)
        params["linear1"] = {
            "w": jax.random.uniform(keys[-2], (fc_in, 100), dtype, -b1, b1),
            "b": jnp.zeros((100,), dtype),
        }
        params["linear2"] = {
            "w": jax.random.uniform(keys[-1], (100, 1), dtype, -0.1, 0.1),
            "b": jnp.zeros((1,), dtype),
        }
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: NHWC in [0,1], spatial dims must equal input_size. Returns (B, 1) logits."""
        fea = _lrelu(conv2d(x, params["conv0"]["w"], params["conv0"]["b"]))
        for i in range(1, 10):
            w = params[f"conv{i}"]["w"]
            fea = _conv_s2(fea, w) if i % 2 == 1 else conv2d(fea, w)
            fea = _lrelu(_bn_apply(params[f"bn{i}"], fea))
        B = fea.shape[0]
        # match torch's NCHW flatten order for any future weight conversion
        fea = fea.transpose(0, 3, 1, 2).reshape(B, -1)
        fea = _lrelu(fea @ params["linear1"]["w"] + params["linear1"]["b"])
        return fea @ params["linear2"]["w"] + params["linear2"]["b"]


@dataclasses.dataclass(frozen=True)
class PatchGANDiscriminatorSpec:
    """PatchGAN: stride-1 valid 3x3 convs + BN, 1-channel prediction map."""

    in_nc: int = 3
    ndf: int = 64
    n_layers: int = 5

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = jax.random.split(key, self.n_layers + 2)
        params = {"conv_in": _conv_init(keys[0], self.in_nc, self.ndf, 3, True, dtype)}
        for i in range(self.n_layers):
            params[f"conv{i}"] = _conv_init(keys[i + 1], self.ndf, self.ndf, 3, False, dtype)
            params[f"bn{i}"] = _bn_init(self.ndf, dtype)
        params["conv_out"] = _conv_init(keys[-1], self.ndf, 1, 3, False, dtype)
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        def valid_conv(h, w, b=None):
            y = jax.lax.conv_general_dilated(
                h, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return y if b is None else y + b

        h = _lrelu(valid_conv(x, params["conv_in"]["w"], params["conv_in"]["b"]))
        for i in range(self.n_layers):
            h = _lrelu(_bn_apply(params[f"bn{i}"], valid_conv(h, params[f"conv{i}"]["w"])))
        return valid_conv(h, params["conv_out"]["w"])
