"""Affine coupling layers.

Behavioral reference: /root/reference/codes/models/modules/AffineCouplings.py.

- ``Affine``: split channels in half; a small conv net on (z1, cond) predicts
  shift/scale for z2.  Scale is clamped via ``logscale = 0.318 * atan(2 * scale)``
  (bounded to ~[-0.5, 0.5], the "FrEIA" variant at AffineCouplings.py:55).
- ``Affine3shift``: rescaling-specific split of 3 (LR) vs rest (HF) channels.
  With ``lr_vs_others=True`` the 3 LR channels drive an affine transform of the HF
  channels; with ``False`` the HF channels drive a shift-only transform of LR
  (AffineCouplings.py:122-160).
- ``AffineInjector``: SRFlow-style cond-only affine on all channels followed by a
  standard coupling (AffineCouplings.py:163-224; unused by shipped configs but kept
  for capability parity).

The shift/scale pair comes from the net output's even/odd channel interleave
("cross" split, thops.py:37-45) — kept bit-compatible for checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import nets


def _clamp_logscale(scale: jnp.ndarray) -> jnp.ndarray:
    return 0.318 * jnp.arctan(2.0 * scale)


def _cross_split(h: jnp.ndarray):
    return h[..., 0::2], h[..., 1::2]


@dataclasses.dataclass(frozen=True)
class CouplingSpec:
    kind: str  # 'Affine' | 'Affine3shift' | 'AffineInjector'
    in_channels: int
    cond_channels: Optional[int] = None
    nn_module: str = "FCN"
    hidden_channels: int = 64
    lr_vs_others: bool = True  # only for Affine3shift
    compute_dtype: Optional[str] = None  # 'bfloat16' => fast MXU mode for the net

    # ---------------------------------------------------------------- net plumbing
    def _net_init(self, key, cin, cout, dtype):
        if self.nn_module == "FCN":
            return nets.init_fcn(key, cin, cout, self.hidden_channels, dtype=dtype)
        if self.nn_module == "DenseBlock":
            return nets.init_dense_block(key, cin, cout, gc=self.hidden_channels, dtype=dtype)
        raise ValueError(f"unknown nn_module {self.nn_module}")

    def _net_apply(self, params, x):
        if self.nn_module == "FCN":
            return nets.apply_fcn(params, x, self.compute_dtype)
        return nets.apply_dense_block(params, x, self.compute_dtype)

    def _net_calib(self, params, x):
        if self.nn_module == "FCN":
            return nets.calib_fcn(params, x)
        return params, nets.apply_dense_block(params, x)

    def _f_channels(self):
        c, cc = self.in_channels, self.cond_channels
        if self.kind == "Affine3shift":
            if self.lr_vs_others:
                fin = 3 if cc is None else 3 + cc
                fout = (c - 3) * 2
            else:
                fin = c - 3 if cc is None else c - 3 + cc
                fout = 3
        else:
            fin = c // 2 if cc is None else c // 2 + cc
            fout = (c - c // 2) * 2
        return fin, fout

    # ----------------------------------------------------------------------- init
    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        fin, fout = self._f_channels()
        if self.kind == "AffineInjector":
            k1, k2 = jax.random.split(key)
            return {
                "f": self._net_init(k1, fin, fout, dtype),
                "f_injector": self._net_init(k2, self.cond_channels, self.in_channels * 2, dtype),
            }
        return {"f": self._net_init(key, fin, fout, dtype)}

    # -------------------------------------------------------------------- helpers
    def _halves(self, z):
        c = self.in_channels
        return z[..., : c // 2], z[..., c // 2 :]

    def _f_input(self, z1, u):
        return z1 if self.cond_channels is None else jnp.concatenate([z1, u], axis=-1)

    # -------------------------------------------------------------------- forward
    def forward(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        if self.kind == "Affine":
            z1, z2 = self._halves(z)
            h = self._net_apply(params["f"], self._f_input(z1, u))
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z2 = (z2 + shift) * jnp.exp(logscale)
            if logdet is not None:
                logdet = logdet + jnp.sum(logscale, axis=(1, 2, 3))
            return jnp.concatenate([z1, z2], -1), logdet

        if self.kind == "Affine3shift":
            if self.lr_vs_others:
                z1, z2 = z[..., :3], z[..., 3:]
                h = self._net_apply(params["f"], self._f_input(z1, u))
                shift, scale = _cross_split(h)
                logscale = _clamp_logscale(scale)
                z2 = (z2 + shift) * jnp.exp(logscale)
                if logdet is not None:
                    logdet = logdet + jnp.sum(logscale, axis=(1, 2, 3))
                return jnp.concatenate([z1, z2], -1), logdet
            else:
                z2, z1 = z[..., :3], z[..., 3:]
                shift = self._net_apply(params["f"], self._f_input(z1, u))
                z2 = z2 + shift
                return jnp.concatenate([z2, z1], -1), logdet

        if self.kind == "AffineInjector":
            h = self._net_apply(params["f_injector"], u)
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z = (z + shift) * jnp.exp(logscale)
            if logdet is not None:
                logdet = logdet + jnp.sum(logscale, axis=(1, 2, 3))
            z1, z2 = self._halves(z)
            h = self._net_apply(params["f"], self._f_input(z1, u))
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z2 = (z2 + shift) * jnp.exp(logscale)
            if logdet is not None:
                logdet = logdet + jnp.sum(logscale, axis=(1, 2, 3))
            return jnp.concatenate([z1, z2], -1), logdet

        raise ValueError(f"unknown coupling kind {self.kind}")

    # -------------------------------------------------------------------- inverse
    def inverse(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        if self.kind == "Affine":
            z1, z2 = self._halves(z)
            h = self._net_apply(params["f"], self._f_input(z1, u))
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z2 = z2 * jnp.exp(-logscale) - shift
            if logdet is not None:
                logdet = logdet - jnp.sum(logscale, axis=(1, 2, 3))
            return jnp.concatenate([z1, z2], -1), logdet

        if self.kind == "Affine3shift":
            if self.lr_vs_others:
                z1, z2 = z[..., :3], z[..., 3:]
                h = self._net_apply(params["f"], self._f_input(z1, u))
                shift, scale = _cross_split(h)
                logscale = _clamp_logscale(scale)
                z2 = z2 * jnp.exp(-logscale) - shift
                return jnp.concatenate([z1, z2], -1), logdet
            else:
                z2, z1 = z[..., :3], z[..., 3:]
                # reference's reverse path ignores cond here (AffineCouplings.py:152)
                shift = self._net_apply(params["f"], z1)
                z2 = z2 - shift
                return jnp.concatenate([z2, z1], -1), logdet

        if self.kind == "AffineInjector":
            z1, z2 = self._halves(z)
            h = self._net_apply(params["f"], self._f_input(z1, u))
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z2 = z2 * jnp.exp(-logscale) - shift
            z = jnp.concatenate([z1, z2], -1)
            h = self._net_apply(params["f_injector"], u)
            shift, scale = _cross_split(h)
            logscale = _clamp_logscale(scale)
            z = z * jnp.exp(-logscale) - shift
            return z, logdet

        raise ValueError(f"unknown coupling kind {self.kind}")

    # ------------------------------------------------- hoisted-cond fast path
    @property
    def supports_hoisting(self) -> bool:
        """The cond contribution to conv1 can be precomputed outside a step scan."""
        return bool(self.kind == "Affine" and self.nn_module == "FCN" and self.cond_channels)

    def forward_hoisted(self, params: dict, z: jnp.ndarray, u_contrib, logdet=None):
        z1, z2 = self._halves(z)
        h = nets.apply_fcn_hoisted(params["f"], z1, u_contrib, self.compute_dtype)
        shift, scale = _cross_split(h)
        logscale = _clamp_logscale(scale)
        z2 = (z2 + shift) * jnp.exp(logscale)
        if logdet is not None:
            logdet = logdet + jnp.sum(logscale, axis=(1, 2, 3))
        return jnp.concatenate([z1, z2], -1), logdet

    def inverse_hoisted(self, params: dict, z: jnp.ndarray, u_contrib, logdet=None):
        z1, z2 = self._halves(z)
        h = nets.apply_fcn_hoisted(params["f"], z1, u_contrib, self.compute_dtype)
        shift, scale = _cross_split(h)
        logscale = _clamp_logscale(scale)
        z2 = z2 * jnp.exp(-logscale) - shift
        if logdet is not None:
            logdet = logdet - jnp.sum(logscale, axis=(1, 2, 3))
        return jnp.concatenate([z1, z2], -1), logdet

    # ---------------------------------------------------------------- calibration
    def calibrate(self, params: dict, z: jnp.ndarray, u=None, logdet=None):
        """Forward pass that also data-initializes the coupling net's ActNorms."""
        new_params = dict(params)
        if self.kind == "Affine":
            z1, _ = self._halves(z)
            new_params["f"], _ = self._net_calib(params["f"], self._f_input(z1, u))
        elif self.kind == "Affine3shift":
            if self.lr_vs_others:
                z1 = z[..., :3]
            else:
                z1 = z[..., 3:]
            new_params["f"], _ = self._net_calib(params["f"], self._f_input(z1, u))
        elif self.kind == "AffineInjector":
            new_params["f_injector"], _ = self._net_calib(params["f_injector"], u)
            # note: z1 stats shift slightly after injector; good enough for init
            zi, _ = self.forward({**params, "f_injector": new_params["f_injector"]}, z, u)
            z1, _ = self._halves(zi)
            new_params["f"], _ = self._net_calib(params["f"], self._f_input(z1, u))
        out, logdet = self.forward(new_params, z, u, logdet)
        return new_params, out, logdet
