"""Per-level conditional flow: RRDB conditioning encoder + conditional flow steps + prior.

Behavioral reference: /root/reference/codes/models/modules/ConditionalFlow.py:15-110.

A split-off latent ``a`` (the high-frequency channels removed at a hierarchy level) is
modeled conditionally on ``u`` (the retained channels, possibly concatenated with
upsampled deeper-level features):

- conditioning encoder: conv_first -> RRDB trunk0 -> (RRDB trunk1 -> trunk_conv1) +
  skip; SR mode returns cat(feat1, feat2) (2*nf channels), rescaling mode a single
  feature level,
- ``n_flow_step`` conditional FlowSteps on ``a`` with the encoder output as cond,
- a zero-init conv prior head mapping cond features to (mean, logs).

SR forward accumulates ``logp(mean, logs, z)`` into logdet; SR reverse samples
``z ~ N(mean, (exp(logs)*eps_std)^2)`` and inverts the steps.  Rescaling mode instead
whitens ``z`` against the prior (an L2 latent target, ConditionalFlow.py:72-83) — note
the reference samples with the *clamped* logscale on the rescaling reverse path
(ConditionalFlow.py:91); we reproduce that.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import densities, nets
from . import stack
from .flowstep import FlowStepSpec


def _clamp_logscale(scale):
    return 0.318 * jnp.arctan(2.0 * scale)


@dataclasses.dataclass(frozen=True)
class ConditionalFlowSpec:
    num_channels: int  # channels entering the split at this level
    num_channels_split: int  # channels retained (passed on); a has C - split channels
    n_flow_step: int = 0
    num_levels_condition: int = 0
    sr: bool = True  # SR prior (logp) vs rescaling prior (whitening)
    rrdb_nb: Sequence[int] = (5, 5)
    rrdb_nf: int = 64
    rrdb_gc: int = 32
    flow_permutation: str = "invconv"
    flow_coupling: str = "Affine"
    nn_module: str = "FCN"
    hidden_channels: int = 64
    compute_dtype: Optional[str] = None
    encoder_dtype: Optional[str] = None  # overrides compute_dtype for the RRDB encoder
    scan_unroll: int = 1
    remat_steps: bool = False
    remat_trunks: bool = True  # trunks are the HBM hogs; cheap to rematerialize

    @property
    def a_channels(self) -> int:
        return self.num_channels - self.num_channels_split

    @property
    def num_features_condition(self) -> int:
        return 2 if self.sr else 1

    @property
    def cond_channels(self) -> int:
        return self.rrdb_nf * self.num_features_condition

    @property
    def conv_first_in(self) -> int:
        return self.num_channels_split + self.cond_channels * self.num_levels_condition

    @property
    def step_spec(self) -> FlowStepSpec:
        return FlowStepSpec(
            in_channels=self.a_channels,
            cond_channels=self.cond_channels,
            flow_permutation=self.flow_permutation,
            flow_coupling=self.flow_coupling,
            nn_module=self.nn_module,
            hidden_channels=self.hidden_channels,
            compute_dtype=self.compute_dtype,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        nf = self.rrdb_nf
        w_first, b_first = nets.torch_default_conv(k1, (3, 3, self.conv_first_in, nf), dtype)
        w_trunk, b_trunk = nets.torch_default_conv(k2, (3, 3, nf, nf), dtype)
        params = {
            "conv_first": {"w": w_first, "b": b_first},
            "trunk0": nets.init_rrdb_trunk(k3, self.rrdb_nb[0], nf, self.rrdb_gc, dtype),
            "trunk1": nets.init_rrdb_trunk(k4, self.rrdb_nb[1], nf, self.rrdb_gc, dtype),
            "trunk_conv1": {"w": w_trunk, "b": b_trunk},
            "f": nets.init_conv_zeros(self.cond_channels, self.a_channels * 2, 3, dtype),
        }
        if self.n_flow_step > 0:
            params["steps"] = stack.init_stack(self.step_spec, k5, self.n_flow_step, dtype)
        return params

    # ------------------------------------------------------------------- encoder
    def _trunk(self, params: dict, name: str, x: jnp.ndarray, cd):
        """One RRDB trunk: fused Pallas path when packed weights are attached
        (serving) and the spatial size fits VMEM; XLA scan otherwise."""
        fused = params.get(f"{name}_fused")
        if fused is not None:
            from ..ops import pallas_rdb

            spec = pallas_rdb.RDBSpec(
                nf=self.rrdb_nf, gc=self.rrdb_gc, H=x.shape[1], W=x.shape[2],
                compute_dtype=cd,
            )
            if (spec.vmem_estimate() <= pallas_rdb.VMEM_BUDGET
                    and pallas_rdb.kernel_compiles(spec)):
                return pallas_rdb.trunk_apply(spec, fused, x)
        return nets.apply_rrdb_trunk(params[name], x, cd, remat=self.remat_trunks)

    def cond_feature(self, params: dict, u: jnp.ndarray) -> jnp.ndarray:
        cd = self.encoder_dtype if self.encoder_dtype is not None else self.compute_dtype
        first = nets.conv2d(
            u, params["conv_first"]["w"], params["conv_first"]["b"], compute_dtype=cd
        )
        if self.sr:
            feat1 = self._trunk(params, "trunk0", first, cd)
            feat2 = (
                nets.conv2d(
                    self._trunk(params, "trunk1", feat1, cd),
                    params["trunk_conv1"]["w"],
                    params["trunk_conv1"]["b"],
                    compute_dtype=cd,
                )
                + first
            )
            return jnp.concatenate([feat1, feat2], axis=-1)
        feat = self._trunk(params, "trunk0", first, cd)
        feat = (
            nets.conv2d(
                self._trunk(params, "trunk1", feat, cd),
                params["trunk_conv1"]["w"],
                params["trunk_conv1"]["b"],
                compute_dtype=cd,
            )
            + first
        )
        return feat

    def _prior(self, params: dict, cond: jnp.ndarray):
        h = nets.apply_conv_zeros(params["f"], cond)
        return h[..., 0::2], h[..., 1::2]  # (mean, logs-or-scale)

    def _run_steps(self, params, z, cond, logdet, inverse: bool):
        """Dispatch to the hoisted fast path when the coupling supports it."""
        ss = self.step_spec
        if inverse and params.get("steps_fused") is not None:
            from ..ops import pallas_chain

            cs = pallas_chain.ChainSpec(
                K=self.n_flow_step, c=self.a_channels, hidden=self.hidden_channels,
                H=z.shape[1], W=z.shape[2], cond=True, compute_dtype=self.compute_dtype,
            )
            if cs.vmem_estimate() <= pallas_chain.VMEM_BUDGET:
                uc = stack.compute_u_contribs_packed(
                    ss, params["steps"], cond,
                    pallas_chain._rup(cs.N, 128), cs.net_dtype,
                )
                return pallas_chain.inverse_chain(cs, params["steps_fused"], z, uc), logdet
        if ss.coupling_spec is not None and ss.coupling_spec.supports_hoisting:
            fn = stack.inverse_stack_hoisted if inverse else stack.forward_stack_hoisted
        else:
            fn = stack.inverse_stack if inverse else stack.forward_stack
        return fn(ss, params["steps"], z, cond, logdet,
                  unroll=self.scan_unroll, remat=self.remat_steps)

    # ------------------------------------------------------------------- forward
    def forward(self, params: dict, a: jnp.ndarray, u: jnp.ndarray, logdet: jnp.ndarray):
        """SR: returns (logdet, cond). Rescaling: returns (fake_z, cond)."""
        cond = self.cond_feature(params, u)
        z = a
        if self.n_flow_step > 0:
            z, logdet = self._run_steps(params, z, cond, logdet, inverse=False)
        mean, second = self._prior(params, cond)
        if self.sr:
            logdet = logdet + densities.gaussian_logp(mean, second, z)
            return logdet, cond
        logscale = _clamp_logscale(second)
        fake_z = (z - mean) * jnp.exp(-logscale)
        return fake_z, cond

    # -------------------------------------------------------------- latent access
    def encode_eps(self, params: dict, a: jnp.ndarray, u: jnp.ndarray):
        """Whitened latent of a under the conditional prior: eps = (f(a)-mean)/std.

        The reference's get_encode_z capability (HCFlow_SR_model.py:328+): exposes the
        exact latent so reverse(..., eps=eps) reproduces a bit-for-bit.
        """
        cond = self.cond_feature(params, u)
        z = a
        if self.n_flow_step > 0:
            zeros = jnp.zeros((z.shape[0],), z.dtype)
            z, _ = self._run_steps(params, z, cond, zeros, inverse=False)
        mean, second = self._prior(params, cond)
        logs = second if self.sr else _clamp_logscale(second)
        return (z - mean) * jnp.exp(-logs)

    # ------------------------------------------------------------------- reverse
    def reverse(self, params: dict, key: jax.Array, u: jnp.ndarray, eps_std, eps=None):
        """Sample a from the conditional prior (or use explicit eps) and invert the
        steps. Returns (a, cond)."""
        cond = self.cond_feature(params, u)
        mean, second = self._prior(params, cond)
        logs = second if self.sr else _clamp_logscale(second)
        if eps is None:
            z = densities.gaussian_sample(key, mean, logs, eps_std)
        else:
            z = mean + jnp.exp(logs) * eps
        if self.n_flow_step > 0:
            zeros = jnp.zeros((z.shape[0],), z.dtype)
            z, _ = self._run_steps(params, z, cond, zeros, inverse=True)
        return z, cond

    # --------------------------------------------------------------- calibration
    def calibrate(self, params: dict, a: jnp.ndarray, u: jnp.ndarray, logdet: jnp.ndarray):
        new = dict(params)
        cond = self.cond_feature(params, u)
        z = a
        if self.n_flow_step > 0:
            new["steps"], z, logdet = stack.calibrate_stack(
                self.step_spec, params["steps"], z, cond, logdet
            )
        mean, second = self._prior(params, cond)
        if self.sr:
            logdet = logdet + densities.gaussian_logp(mean, second, z)
            return new, logdet, cond
        logscale = _clamp_logscale(second)
        return new, (z - mean) * jnp.exp(-logscale), cond
