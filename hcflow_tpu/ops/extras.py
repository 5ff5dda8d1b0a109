"""Inventory-parity ops that the shipped configs don't use but the reference provides.

Behavioral references:
- Sigmoid flow: /root/reference/codes/models/modules/Basic.py:204-216 — invertible
  sigmoid with logdet (forward: -sum(softplus(x) + softplus(-x)); inverse: logit with
  logdet -sum(log y + log(1-y))).
- MaskedActNorm2d: ActNorms.py:109-121 — actnorm applied only where a boolean mask is
  set (output/logdet merged elementwise).
- Learned-prior splits (SRFlow lineage): Basic.py:219-326 — Split2d (half split,
  zero-conv prior from the kept half), Split2d_LR (explicit split size), and
  Split2d_conditional (consume ratio + conditional features + eps reparametrization).
- RDN: Basic.py:400-423 — conv_first -> RRDB trunk -> trunk_conv + skip -> conv_last
  (zero-init for flow use).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import actnorm, nets
from .densities import gaussian_logp

_AXES = (1, 2, 3)


# ---------------------------------------------------------------- Sigmoid flow
def sigmoid_forward(x: jnp.ndarray, logdet=None):
    y = jax.nn.sigmoid(x)
    if logdet is not None:
        logdet = logdet - jnp.sum(jax.nn.softplus(x) + jax.nn.softplus(-x), axis=_AXES)
    return y, logdet


def sigmoid_inverse(y: jnp.ndarray, logdet=None):
    x = -jnp.log(1.0 / y - 1.0)
    if logdet is not None:
        logdet = logdet - jnp.sum(jnp.log(y) + jnp.log1p(-y), axis=_AXES)
    return x, logdet


# ------------------------------------------------------------- Masked ActNorm
def masked_actnorm_forward(params: dict, x: jnp.ndarray, mask: jnp.ndarray, logdet=None):
    """ActNorm applied only to masked batch elements (ActNorms.py:109-121).

    mask: (B,) bool — True elements get the actnorm output/logdet, False pass through.
    """
    y, ld = actnorm.forward(params, x, logdet)
    out = jnp.where(mask[:, None, None, None], y, x)
    if logdet is not None:
        logdet = jnp.where(mask, ld, logdet)
    return out, logdet


def masked_actnorm_inverse(params: dict, y: jnp.ndarray, mask: jnp.ndarray, logdet=None):
    x, ld = actnorm.inverse(params, y, logdet)
    out = jnp.where(mask[:, None, None, None], x, y)
    if logdet is not None:
        logdet = jnp.where(mask, ld, logdet)
    return out, logdet


# --------------------------------------------------------- learned-prior splits
def _cross(h):
    return h[..., 0::2], h[..., 1::2]


@dataclasses.dataclass(frozen=True)
class Split2dSpec:
    """Channel split with a learned zero-conv Gaussian prior on the dropped half.

    ``num_channels_pass`` channels continue; the rest are scored against / sampled
    from N(mean, exp(logs)) predicted from the kept half (+ optional cond features).
    Covers Split2d (pass = C//2), Split2d_LR (explicit pass count) and the
    conditional variant (cond_channels > 0, logs_eps floor, eps reparametrization).
    """

    num_channels: int
    num_channels_pass: int
    cond_channels: int = 0
    logs_eps: float = 0.0

    @property
    def num_channels_consume(self) -> int:
        return self.num_channels - self.num_channels_pass

    def init(self, dtype=jnp.float32) -> dict:
        cin = self.num_channels_pass + self.cond_channels
        return {"conv": nets.init_conv_zeros(cin, self.num_channels_consume * 2, 3, dtype)}

    def _prior(self, params, z1, ft=None):
        h = z1 if ft is None else jnp.concatenate([z1, ft], axis=-1)
        h = nets.apply_conv_zeros(params["conv"], h)
        return _cross(h)

    def forward(self, params: dict, x: jnp.ndarray, logdet, ft=None):
        """Returns (z1, logdet, eps) — eps is the whitened dropped half."""
        z1 = x[..., : self.num_channels_pass]
        z2 = x[..., self.num_channels_pass :]
        mean, logs = self._prior(params, z1, ft)
        eps = (z2 - mean) / (jnp.exp(logs) + self.logs_eps)
        logdet = logdet + gaussian_logp(mean, logs, z2)
        return z1, logdet, eps

    def inverse(self, params: dict, key, z1: jnp.ndarray, logdet, eps=None,
                eps_std: float = 1.0, ft=None):
        mean, logs = self._prior(params, z1, ft)
        if eps is None:
            eps = jax.random.normal(key, mean.shape, mean.dtype) * eps_std
        z2 = mean + (jnp.exp(logs) + self.logs_eps) * eps
        z = jnp.concatenate([z1, z2], axis=-1)
        logdet = logdet - gaussian_logp(mean, logs, z2)
        return z, logdet


# ------------------------------------------------------------------------- RDN
@dataclasses.dataclass(frozen=True)
class RDNSpec:
    """conv_first -> nb RRDBs -> trunk_conv + skip -> conv_last (zero for flow)."""

    in_channels: int
    out_channels: int
    nb: int = 3
    nf: int = 64
    gc: int = 32

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "conv_first": {
                "w": nets.xavier_normal(k1, (3, 3, self.in_channels, self.nf), 0.1, dtype),
                "b": jnp.zeros((self.nf,), dtype),
            },
            "trunk": nets.init_rrdb_trunk(k2, self.nb, self.nf, self.gc, dtype),
            "trunk_conv": {
                "w": nets.xavier_normal(k3, (3, 3, self.nf, self.nf), 0.1, dtype),
                "b": jnp.zeros((self.nf,), dtype),
            },
            "conv_last": {
                "w": jnp.zeros((3, 3, self.nf, self.out_channels), dtype),
                "b": jnp.zeros((self.out_channels,), dtype),
            },
        }

    def apply(self, params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
        h = nets.conv2d(x, params["conv_first"]["w"], params["conv_first"]["b"],
                        compute_dtype=compute_dtype)
        t = nets.apply_rrdb_trunk(params["trunk"], h, compute_dtype)
        h = nets.conv2d(t, params["trunk_conv"]["w"], params["trunk_conv"]["b"],
                        compute_dtype=compute_dtype) + h
        return nets.conv2d(h, params["conv_last"]["w"], params["conv_last"]["b"],
                           compute_dtype=compute_dtype)
