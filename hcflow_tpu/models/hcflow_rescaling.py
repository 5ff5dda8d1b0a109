"""Top-level HCFlow rescaling model: HR <-> (LR, whitened latents), no NLL.

Behavioral reference: /root/reference/codes/models/modules/HCFlowNet_Rescaling_arch.py.
No dequantization noise (commented out as worse in the reference).  Forward returns the
(clamped) generated LR plus per-level whitened latents used for an L2 latent loss;
reverse reconstructs HR from a (quantized) LR at temperature eps_std.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..flow.flownet import FlowNetSpec


@dataclasses.dataclass(frozen=True)
class HCFlowRescalingSpec:
    flow: FlowNetSpec

    @classmethod
    def default_x4(cls, **flow_kwargs) -> "HCFlowRescalingSpec":
        """Shipped train_Rescaling_DF2K_4X_HCFlow.yml topology."""
        defaults = dict(
            L=2,
            K=(14, 14),
            after_splitoff=(6, 6),
            squeeze="haar",
            flow_permutation="none",
            flow_coupling="Affine3shift",
            nn_module="DenseBlock",
            hidden_channels=32,
            sr=False,
            so_flow_permutation="invconv",
            so_flow_coupling="Affine",
            so_nn_module="FCN",
            so_hidden_channels=64,
            rrdb_nb=(2, 1),
            rrdb_nf=64,
            rrdb_gc=16,
        )
        defaults.update(flow_kwargs)
        return cls(flow=FlowNetSpec(**defaults))

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return self.flow.init(key, dtype)

    def forward(self, params: dict, hr: jnp.ndarray):
        """HR -> (fake LR in [0,1], [whitened latent per level])."""
        B = hr.shape[0]
        logdet = jnp.zeros((B,), hr.dtype)
        z, fake_zs = self.flow.normal_flow(params, hr, logdet)
        return jnp.clip(z, 0.0, 1.0), fake_zs

    def reverse(self, params: dict, key: jax.Array, lr: jnp.ndarray, eps_std):
        hr = self.flow.reverse_flow(params, key, lr, eps_std)
        return jnp.clip(hr, 0.0, 1.0)

    def calibrate(self, params: dict, hr: jnp.ndarray):
        B = hr.shape[0]
        logdet = jnp.zeros((B,), hr.dtype)
        new_params, _, _ = self.flow.calibrate(params, hr, logdet)
        return new_params
