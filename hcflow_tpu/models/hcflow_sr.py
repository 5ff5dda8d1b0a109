"""Top-level HCFlow SR model: bijective HR <-> (LR, z) with a Dirac-LR NLL objective.

Behavioral reference: /root/reference/codes/models/modules/HCFlowNet_SR_arch.py:11-75.

Forward (normal flow): uniform dequantization noise ``hr + U(0,1)/quant``, logdet
initialized to ``-log(quant) * pixels``; the flow maps HR to a fake LR plus per-level
latents whose prior logp accumulates into logdet; the fake LR is quantized (straight-
through) and tied to the true LR by a narrow Gaussian ("Dirac") logp with logs=-6.
NLL is reported in bits/dim.

Reverse: sample latents at temperature eps_std conditioned on the LR, invert the flow,
clamp to [0,1].
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..flow.flownet import FlowNetSpec
from ..ops.densities import gaussian_logp
from ..ops.quant import quantize_ste


@dataclasses.dataclass(frozen=True)
class HCFlowSRSpec:
    flow: FlowNetSpec
    quant: int = 256

    @classmethod
    def for_scale(cls, scale: int, quant: int = None, **flow_kwargs) -> "HCFlowSRSpec":
        """Shipped topologies: x4 => L=2 (quant 64), x8 => L=3 (quant 256)."""
        if scale == 4:
            defaults = dict(L=2, K=(26, 26), after_splitoff=(13, 13), rrdb_nb=(7, 7))
            quant = 64 if quant is None else quant
        elif scale == 8:
            defaults = dict(L=3, K=(26, 26, 26), after_splitoff=(13, 13, 13), rrdb_nb=(5, 5))
            quant = 256 if quant is None else quant
        else:
            raise NotImplementedError(f"scale {scale} is not implemented")
        defaults.update(flow_kwargs)
        return cls(flow=FlowNetSpec(sr=True, **defaults), quant=quant)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return self.flow.init(key, dtype)

    # ------------------------------------------------------------- normal flow
    def forward(self, params: dict, key: jax.Array, hr: jnp.ndarray, lr: jnp.ndarray,
                noise=None):
        """HR -> (fake LR in [0,1], nll in bits/dim). hr/lr are NHWC in [0,1].

        noise: optional explicit dequantization noise in [0,1) (same shape as hr) —
        pass zeros for deterministic parity checks; None samples U(0,1)/quant.
        """
        B, H, W, _ = hr.shape
        pixels = H * W
        if noise is None:
            noise = jax.random.uniform(key, hr.shape, hr.dtype)
        hr = hr + noise / self.quant
        logdet = jnp.full((B,), -math.log(self.quant) * pixels, hr.dtype)

        z, logdet = self.flow.normal_flow(params, hr, logdet)
        fake_lr = quantize_ste(z)

        # narrow Gaussian approximating a Dirac delta tying fake LR to the true LR
        objective = logdet + gaussian_logp(lr, jnp.full_like(lr, -6.0), fake_lr)
        nll = jnp.mean(-objective / (math.log(2.0) * pixels))
        return jnp.clip(fake_lr, 0.0, 1.0), nll

    # ------------------------------------------------------------ reverse flow
    def reverse(self, params: dict, key: jax.Array, lr: jnp.ndarray, eps_std):
        """LR -> HR sample at temperature eps_std; output clamped to [0,1]."""
        hr = self.flow.reverse_flow(params, key, lr, eps_std)
        return jnp.clip(hr, 0.0, 1.0)

    # ------------------------------------------------------------- calibration
    def calibrate(self, params: dict, key: jax.Array, hr: jnp.ndarray, lr: jnp.ndarray):
        """One-time data-dependent ActNorm init on a real batch; returns new params."""
        B, H, W, _ = hr.shape
        hr = hr + jax.random.uniform(key, hr.shape, hr.dtype) / self.quant
        logdet = jnp.full((B,), -math.log(self.quant) * (H * W), hr.dtype)
        new_params, _, _ = self.flow.calibrate(params, hr, logdet)
        return new_params
