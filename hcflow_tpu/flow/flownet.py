"""Hierarchical flow network: L levels of (squeeze -> flow steps -> split + cond flow).

Behavioral reference: /root/reference/codes/models/modules/FlowNet_SR_x4.py,
FlowNet_SR_x8.py and FlowNet_Rescaling_x4.py.  The reference ships three near-identical
hand-written topologies; here one generic L-level builder covers all of them:

- per level: squeeze (checkerboard or Haar) -> K[level] - after_splitoff[level] main
  FlowSteps -> channel split.  Retained channels: C//2 for inner levels, 3 (the LR
  image) at the deepest level.
- after the deepest split, per-level ConditionalFlows model the split-off latents,
  deepest first; level i's conditioning input is cat(y_i, up_2(cf_{i+1}),
  up_4(cf_{i+2}), ...) — the retained channels plus nearest-upsampled conditioning
  features of all deeper levels (FlowNet_SR_x8.py:107-114).

Forward (normal flow) maps HR -> LR z (+ logdet for SR, or whitened latents for
rescaling); reverse samples the latents at temperature eps_std and reconstructs HR.
Main-step sequences run as lax.scan over stacked params when homogeneous; the
rescaling variant's alternating Affine3shift steps are heterogeneous and unroll.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.squeeze import (
    haar_squeeze2d,
    haar_unsqueeze2d,
    nearest_upsample,
    squeeze2d,
    unsqueeze2d,
)
from . import stack
from .conditional import ConditionalFlowSpec
from .flowstep import FlowStepSpec


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    level: int
    channels: int  # channels after this level's squeeze
    n_main: int
    split_channels: int  # retained channels after the split
    main_spec: FlowStepSpec  # template (lr_vs_others may alternate per step)
    cond_spec: ConditionalFlowSpec
    alternate_lrvsothers: bool  # Affine3shift parity alternation (rescaling)

    def main_step_spec(self, k: int) -> FlowStepSpec:
        if not self.alternate_lrvsothers:
            return self.main_spec
        return dataclasses.replace(self.main_spec, lr_vs_others=(k % 2 == 0))


@dataclasses.dataclass(frozen=True)
class FlowNetSpec:
    in_channels: int = 3
    L: int = 2
    K: Sequence[int] = (26, 26)
    after_splitoff: Sequence[int] = (13, 13)
    squeeze: str = "checkerboard"  # 'checkerboard' | 'haar'
    flow_permutation: str = "invconv"
    flow_coupling: str = "Affine"
    nn_module: str = "FCN"
    hidden_channels: int = 64
    cond_channels: Optional[int] = None
    sr: bool = True
    # splitOff sub-config (conditional flows)
    so_flow_permutation: str = "invconv"
    so_flow_coupling: str = "Affine"
    so_nn_module: str = "FCN"
    so_hidden_channels: int = 64
    rrdb_nb: Sequence[int] = (5, 5)
    rrdb_nf: int = 64
    rrdb_gc: int = 32
    compute_dtype: Optional[str] = None  # 'bfloat16' => coupling/encoder nets in bf16
    encoder_dtype: Optional[str] = None  # encoder-only override (e.g. bf16 encoders + f32 couplings)
    scan_unroll: int = 1  # unroll factor for step scans (XLA cross-step fusion)
    remat_steps: bool = False  # rematerialize step scans on backward (memory)
    remat_trunks: bool = True  # rematerialize RRDB trunk scans (the HBM hogs)

    @property
    def levels(self) -> Tuple[LevelSpec, ...]:
        out = []
        c = self.in_channels
        alternate = self.flow_coupling == "Affine3shift"
        for level in range(self.L):
            c = c * 4
            split_c = c // 2 if level < self.L - 1 else 3
            main = FlowStepSpec(
                in_channels=c,
                cond_channels=self.cond_channels,
                flow_permutation=self.flow_permutation,
                flow_coupling=self.flow_coupling,
                nn_module=self.nn_module,
                hidden_channels=self.hidden_channels,
                compute_dtype=self.compute_dtype,
            )
            cond = ConditionalFlowSpec(
                num_channels=c,
                num_channels_split=split_c,
                n_flow_step=self.after_splitoff[level],
                num_levels_condition=self.L - 1 - level,
                sr=self.sr,
                rrdb_nb=tuple(self.rrdb_nb),
                rrdb_nf=self.rrdb_nf,
                rrdb_gc=self.rrdb_gc,
                flow_permutation=self.so_flow_permutation,
                flow_coupling=self.so_flow_coupling,
                nn_module=self.so_nn_module,
                hidden_channels=self.so_hidden_channels,
                compute_dtype=self.compute_dtype,
                encoder_dtype=self.encoder_dtype,
                scan_unroll=self.scan_unroll,
                remat_steps=self.remat_steps,
                remat_trunks=self.remat_trunks,
            )
            out.append(
                LevelSpec(
                    level=level,
                    channels=c,
                    n_main=self.K[level] - self.after_splitoff[level],
                    split_channels=split_c,
                    main_spec=main,
                    cond_spec=cond,
                    alternate_lrvsothers=alternate,
                )
            )
            c = split_c
        return tuple(out)

    @property
    def z_channels(self) -> int:
        return 3

    # -------------------------------------------------------------------- squeeze
    def _squeeze(self, x):
        return haar_squeeze2d(x) if self.squeeze == "haar" else squeeze2d(x)

    def _unsqueeze(self, x):
        return haar_unsqueeze2d(x) if self.squeeze == "haar" else unsqueeze2d(x)

    # ----------------------------------------------------------------------- init
    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        params = {}
        for lv in self.levels:
            k_main, k_cond, key = jax.random.split(key, 3)
            if lv.alternate_lrvsothers:
                ks = jax.random.split(k_main, max(lv.n_main, 1))
                main = [lv.main_step_spec(k).init(ks[k], dtype) for k in range(lv.n_main)]
            elif lv.n_main > 0:
                main = stack.init_stack(lv.main_spec, k_main, lv.n_main, dtype)
            else:
                main = []
            params[f"level{lv.level}"] = {
                "main": main,
                "cond": lv.cond_spec.init(k_cond, dtype),
            }
        return params

    # --------------------------------------------------------------- main helpers
    def _main_forward(self, lv: LevelSpec, main_params, z, logdet):
        if lv.n_main == 0:
            return z, logdet
        if lv.alternate_lrvsothers:
            for k in range(lv.n_main):
                z, logdet = lv.main_step_spec(k).forward(main_params[k], z, None, logdet)
            return z, logdet
        return stack.forward_stack(lv.main_spec, main_params, z, None, logdet,
                                   unroll=self.scan_unroll, remat=self.remat_steps)

    def _main_inverse(self, lv: LevelSpec, level_params, z, logdet):
        if lv.n_main == 0:
            return z, logdet
        main_params = level_params["main"]
        if lv.alternate_lrvsothers:
            packed3s = level_params.get("main3s_fused")
            if packed3s is not None:
                from ..ops import pallas_chain3s

                cs = pallas_chain3s.Chain3sSpec(
                    K=lv.n_main, c=lv.channels, gc=self.hidden_channels,
                    H=z.shape[1], W=z.shape[2], compute_dtype=self.compute_dtype,
                )
                if (
                    cs.vmem_estimate() <= pallas_chain3s.VMEM_BUDGET
                    and pallas_chain3s.chain_compiles(cs)
                ):
                    z, ld = pallas_chain3s.inverse_chain(cs, packed3s, z)
                    return z, (logdet + ld if logdet is not None else None)
            for k in reversed(range(lv.n_main)):
                z, logdet = lv.main_step_spec(k).inverse(main_params[k], z, None, logdet)
            return z, logdet
        packed = level_params.get("main_fused")
        if packed is not None:
            from ..ops import pallas_chain

            cs = pallas_chain.ChainSpec(
                K=lv.n_main, c=lv.channels, hidden=self.hidden_channels,
                H=z.shape[1], W=z.shape[2], cond=False,
                compute_dtype=self.compute_dtype,
            )
            if cs.vmem_estimate() <= pallas_chain.VMEM_BUDGET:
                return pallas_chain.inverse_chain(cs, packed, z), logdet
        return stack.inverse_stack(lv.main_spec, main_params, z, None, logdet,
                                   unroll=self.scan_unroll, remat=self.remat_steps)

    def _cond_input(self, i: int, y_i, cond_feats):
        """cat(y_i, up_2(cf_{i+1}), up_4(cf_{i+2}), ...)."""
        pieces = [y_i]
        for j in range(i + 1, self.L):
            pieces.append(nearest_upsample(cond_feats[j], 2 ** (j - i)))
        return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)

    # -------------------------------------------------------------------- forward
    def normal_flow(self, params: dict, hr: jnp.ndarray, logdet: jnp.ndarray):
        """HR -> z (LR). SR: returns (z, logdet). Rescaling: (z, [fake_z per level])."""
        z = hr
        ys, a_s = [], []
        for lv in self.levels:
            z = self._squeeze(z)
            z, logdet = self._main_forward(lv, params[f"level{lv.level}"]["main"], z, logdet)
            ys.append(z[..., : lv.split_channels])
            a_s.append(z[..., lv.split_channels :])
            z = ys[-1]

        cond_feats = [None] * self.L
        fake_zs = [None] * self.L
        for i in reversed(range(self.L)):
            lv = self.levels[i]
            u = self._cond_input(i, ys[i], cond_feats)
            if self.sr:
                logdet, cond_feats[i] = lv.cond_spec.forward(
                    params[f"level{i}"]["cond"], a_s[i], u, logdet
                )
            else:
                fake_zs[i], cond_feats[i] = lv.cond_spec.forward(
                    params[f"level{i}"]["cond"], a_s[i], u, logdet
                )
        if self.sr:
            return z, logdet
        return z, fake_zs

    # -------------------------------------------------------------------- reverse
    def reverse_flow(self, params: dict, key: jax.Array, lr: jnp.ndarray, eps_std,
                     eps_list=None):
        """z (LR) -> HR, sampling split-off latents at temperature eps_std.

        eps_list: optional explicit whitened latents per level (from :meth:`encode`)
        — overrides sampling, giving an exact decode / latent-manipulation API.
        """
        z = lr
        cond_feats = [None] * self.L
        keys = jax.random.split(key, self.L)
        for i in reversed(range(self.L)):
            lv = self.levels[i]
            u = self._cond_input(i, z, cond_feats)
            a, cond_feats[i] = lv.cond_spec.reverse(
                params[f"level{i}"]["cond"], keys[i], u, eps_std,
                eps=None if eps_list is None else eps_list[i],
            )
            z = jnp.concatenate([z, a], axis=-1)
            zeros = jnp.zeros((z.shape[0],), z.dtype)
            z, _ = self._main_inverse(lv, params[f"level{i}"], z, zeros)
            z = self._unsqueeze(z)
        return z

    # --------------------------------------------------------------------- encode
    def encode(self, params: dict, hr: jnp.ndarray):
        """HR -> (z, [whitened latent eps per level]) — exact inverse inputs.

        ``reverse_flow(params, key, z, eps_std, eps_list=eps)`` reconstructs hr
        exactly (up to f32): the runtime invertibility oracle, and the basis for
        latent-space manipulation (the reference's get_encode_z / get_sr_with_z).
        """
        z = hr
        ys, a_s = [], []
        zeros = jnp.zeros((hr.shape[0],), hr.dtype)
        for lv in self.levels:
            z = self._squeeze(z)
            z, _ = self._main_forward(lv, params[f"level{lv.level}"]["main"], z, zeros)
            ys.append(z[..., : lv.split_channels])
            a_s.append(z[..., lv.split_channels :])
            z = ys[-1]
        cond_feats = [None] * self.L
        eps_list = [None] * self.L
        for i in reversed(range(self.L)):
            lv = self.levels[i]
            u = self._cond_input(i, ys[i], cond_feats)
            cond_feats[i] = lv.cond_spec.cond_feature(params[f"level{i}"]["cond"], u)
            eps_list[i] = lv.cond_spec.encode_eps(params[f"level{i}"]["cond"], a_s[i], u)
        return z, eps_list

    # --------------------------------------------------------------- inference prep
    def precompute_inference(self, params: dict, fused=False) -> dict:
        """Attach batched invconv inverses/logdets to the params for serving.

        Run once after loading a checkpoint: removes all LU factorizations from the
        jitted hot path (they otherwise run per reverse/forward call).

        fused=True additionally packs every eligible step chain (Affine+FCN+invconv)
        for the fused Pallas inverse kernel (ops/pallas_chain.py); fused="all"
        also packs the RRDB trunks for the fused encoder kernel
        (ops/pallas_rdb.py) — together the production serving path on TPU (safe
        in dispatch and in-graph loop contexts; see the pallas_rdb docstring).
        Training params must never carry these (no VJP).
        """
        from ..ops import invconv as invconv_mod
        from ..ops import pallas_chain

        new = {}
        for lv in self.levels:
            lp = dict(params[f"level{lv.level}"])
            main = lp["main"]
            if lv.alternate_lrvsothers:
                main = [
                    {**p, "invconv": invconv_mod.precompute(p["invconv"])}
                    if "invconv" in p
                    else p
                    for p in main
                ]
            elif lv.n_main > 0 and "invconv" in main:
                main = stack._augment_invconv(main, need_inv=True, need_logdet=True)
            lp["main"] = main
            if fused and lv.alternate_lrvsothers:
                from ..ops import pallas_chain3s

                if pallas_chain3s.ENABLED and pallas_chain3s.supported(
                    lv, self.hidden_channels
                ):
                    cs3 = pallas_chain3s.Chain3sSpec(
                        K=lv.n_main, c=lv.channels, gc=self.hidden_channels,
                        H=0, W=0, compute_dtype=self.compute_dtype,
                    )
                    lp["main3s_fused"] = pallas_chain3s.pack_inverse_chain3s(cs3, main)
            if (
                fused
                and lv.n_main > 0
                and not lv.alternate_lrvsothers
                and pallas_chain.supported(lv.main_spec)
            ):
                cs = pallas_chain.ChainSpec(
                    K=lv.n_main, c=lv.channels, hidden=self.hidden_channels,
                    H=0, W=0, cond=False, compute_dtype=self.compute_dtype,
                )
                lp["main_fused"] = pallas_chain.pack_inverse_chain(cs, main)
            cond = dict(lp["cond"])
            if "steps" in cond and "invconv" in cond["steps"]:
                cond["steps"] = stack._augment_invconv(
                    cond["steps"], need_inv=True, need_logdet=True
                )
                so = lv.cond_spec
                if (
                    fused
                    and pallas_chain.supported(so.step_spec)
                    and so.step_spec.coupling_spec.supports_hoisting
                ):
                    cs = pallas_chain.ChainSpec(
                        K=so.n_flow_step, c=so.a_channels, hidden=so.hidden_channels,
                        H=0, W=0, cond=True, compute_dtype=so.compute_dtype,
                    )
                    cond["steps_fused"] = pallas_chain.pack_inverse_chain(
                        cs, cond["steps"]
                    )
            so = lv.cond_spec
            # accumulator row blocks are sublane slices at multiples of gc: the
            # fused trunk needs 8-aligned channel counts (all shipped configs).
            # The round-2 fori-loop fault is root-caused and fixed (the kernel
            # now fits the 16 MB default scoped-VMEM limit — pallas_rdb.py
            # docstring); fused="all" is safe in both dispatch and in-graph
            # loop contexts and is the production serving default.
            if fused == "all" and so.rrdb_gc % 8 == 0 and so.rrdb_nf % 8 == 0:
                from ..ops import pallas_rdb

                cd = so.encoder_dtype if so.encoder_dtype is not None else so.compute_dtype
                rspec = pallas_rdb.RDBSpec(
                    nf=so.rrdb_nf, gc=so.rrdb_gc, H=0, W=0, compute_dtype=cd
                )
                for trunk in ("trunk0", "trunk1"):
                    cond[f"{trunk}_fused"] = pallas_rdb.pack_rrdb_trunk(
                        rspec, cond[trunk]
                    )
            lp["cond"] = cond
            new[f"level{lv.level}"] = lp
        return new

    # ---------------------------------------------------------------- calibration
    def calibrate(self, params: dict, hr: jnp.ndarray, logdet: jnp.ndarray):
        """Data-dependent ActNorm init pass; returns (new_params, z, logdet-or-fake_zs)."""
        new = {k: dict(v) for k, v in params.items()}
        z = hr
        ys, a_s = [], []
        for lv in self.levels:
            z = self._squeeze(z)
            mp = params[f"level{lv.level}"]["main"]
            if lv.n_main == 0:
                pass
            elif lv.alternate_lrvsothers:
                new_main = []
                for k in range(lv.n_main):
                    p, z, logdet = lv.main_step_spec(k).calibrate(mp[k], z, None, logdet)
                    new_main.append(p)
                new[f"level{lv.level}"]["main"] = new_main
            else:
                new_main, z, logdet = stack.calibrate_stack(lv.main_spec, mp, z, None, logdet)
                new[f"level{lv.level}"]["main"] = new_main
            ys.append(z[..., : lv.split_channels])
            a_s.append(z[..., lv.split_channels :])
            z = ys[-1]

        cond_feats = [None] * self.L
        fake_zs = [None] * self.L
        for i in reversed(range(self.L)):
            lv = self.levels[i]
            u = self._cond_input(i, ys[i], cond_feats)
            if self.sr:
                new_cond, logdet, cond_feats[i] = lv.cond_spec.calibrate(
                    params[f"level{i}"]["cond"], a_s[i], u, logdet
                )
            else:
                new_cond, fake_zs[i], cond_feats[i] = lv.cond_spec.calibrate(
                    params[f"level{i}"]["cond"], a_s[i], u, logdet
                )
            new[f"level{i}"]["cond"] = new_cond
        if self.sr:
            return new, z, logdet
        return new, z, fake_zs
