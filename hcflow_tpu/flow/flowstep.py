"""One Glow-style flow step: ActNorm -> (invertible 1x1 conv) -> coupling.

Behavioral reference: /root/reference/codes/models/modules/FlowStep.py:8-64.
The inverse runs the three inverses in reverse order.  Unlike the reference (a
``reverse=`` flag threaded through nn.Modules), forward and inverse are separate pure
functions compiled independently by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import actnorm, coupling, invconv, permute


@dataclasses.dataclass(frozen=True)
class FlowStepSpec:
    in_channels: int
    cond_channels: Optional[int] = None
    flow_permutation: str = "invconv"  # 'invconv' | 'none'
    flow_coupling: str = "Affine"  # 'Affine' | 'Affine3shift' | 'AffineInjector' | 'noCoupling'
    nn_module: str = "FCN"
    hidden_channels: int = 64
    lr_vs_others: bool = True
    lu_decomposed: bool = False
    compute_dtype: Optional[str] = None

    @property
    def coupling_spec(self) -> Optional[coupling.CouplingSpec]:
        if self.flow_coupling == "noCoupling":
            return None
        return coupling.CouplingSpec(
            kind=self.flow_coupling,
            in_channels=self.in_channels,
            cond_channels=self.cond_channels,
            nn_module=self.nn_module,
            hidden_channels=self.hidden_channels,
            lr_vs_others=self.lr_vs_others,
            compute_dtype=self.compute_dtype,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        kp, kc = jax.random.split(key)
        params = {"actnorm": actnorm.init(self.in_channels, dtype)}
        if self.flow_permutation == "invconv":
            ini = invconv.init_lu if self.lu_decomposed else invconv.init
            params["invconv"] = ini(kp, self.in_channels, dtype)
        elif self.flow_permutation in ("reverse", "shuffle"):
            params["permute"] = permute.init(
                self.in_channels, shuffle=self.flow_permutation == "shuffle"
            )
        cs = self.coupling_spec
        if cs is not None:
            params["coupling"] = cs.init(kc, dtype)
        return params

    def forward(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        z, logdet = actnorm.forward(params["actnorm"], z, logdet)
        if "invconv" in params:
            z, logdet = invconv.forward(params["invconv"], z, logdet)
        elif "permute" in params:
            z, logdet = permute.forward(params["permute"], z, logdet)
        cs = self.coupling_spec
        if cs is not None:
            z, logdet = cs.forward(params["coupling"], z, u, logdet)
        return z, logdet

    def inverse(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        cs = self.coupling_spec
        if cs is not None:
            z, logdet = cs.inverse(params["coupling"], z, u, logdet)
        if "invconv" in params:
            z, logdet = invconv.inverse(params["invconv"], z, logdet)
        elif "permute" in params:
            z, logdet = permute.inverse(params["permute"], z, logdet)
        z, logdet = actnorm.inverse(params["actnorm"], z, logdet)
        return z, logdet

    def forward_hoisted(self, params: dict, z: jnp.ndarray, u_contrib, logdet=None):
        """Forward with the coupling's cond contribution precomputed (see stack.py)."""
        z, logdet = actnorm.forward(params["actnorm"], z, logdet)
        if "invconv" in params:
            z, logdet = invconv.forward(params["invconv"], z, logdet)
        elif "permute" in params:
            z, logdet = permute.forward(params["permute"], z, logdet)
        z, logdet = self.coupling_spec.forward_hoisted(params["coupling"], z, u_contrib, logdet)
        return z, logdet

    def inverse_hoisted(self, params: dict, z: jnp.ndarray, u_contrib, logdet=None):
        z, logdet = self.coupling_spec.inverse_hoisted(params["coupling"], z, u_contrib, logdet)
        if "invconv" in params:
            z, logdet = invconv.inverse(params["invconv"], z, logdet)
        elif "permute" in params:
            z, logdet = permute.inverse(params["permute"], z, logdet)
        z, logdet = actnorm.inverse(params["actnorm"], z, logdet)
        return z, logdet

    def calibrate(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        """Data-dependent-init forward pass (flow actnorm + coupling-net actnorms)."""
        new = dict(params)
        new["actnorm"] = actnorm.calibrate(z)
        z, logdet = actnorm.forward(new["actnorm"], z, logdet)
        if "invconv" in params:
            z, logdet = invconv.forward(params["invconv"], z, logdet)
        cs = self.coupling_spec
        if cs is not None:
            new["coupling"], z, logdet = cs.calibrate(params["coupling"], z, u, logdet)
        return new, z, logdet
