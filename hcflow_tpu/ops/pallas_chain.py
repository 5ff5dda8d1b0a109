"""Fused inverse flow-step-chain Pallas kernel (the serving hot loop).

Behavioral reference: /root/reference/codes/models/modules/FlowStep.py:53-64 run 13x
per level (x26 steps total for the x4 SR config) inside the reverse flow — the
reference executes these as a Python loop of small CUDA convs; the round-1 TPU port
ran them as a lax.scan at ~1.6 TFLOP/s, bound by tiny-channel layouts (6-24 channels
against 128 lanes) and per-op fusion boundaries.

This kernel runs one ENTIRE K-step chain per invocation with everything resident in
VMEM, using a channels-in-sublanes / spatial-in-lanes layout (z as (C, H*W)):

- 3x3 convs become 9 rolled-and-masked taps feeding MXU matmuls with the flattened
  spatial dim streaming through the lanes:
  - coupling conv1 (z1 -> hidden): input-gather (roll the tiny z1, 9 skinny matmuls)
  - coupling conv3 (hidden -> shift/scale): output-scatter — ONE tall matmul
    (9*fout_padded, hidden) @ (hidden, N), then 9 cheap slab roll-adds; this lifts
    MXU row utilization from fout (6-24) to 9*fout.
- conv3 weights are pre-permuted so shift/scale are contiguous row blocks (the
  reference's even/odd "cross" interleave, thops.py:37-45, becomes a weight
  permutation done once at pack time).
- the invertible tail of each step — 1x1 invconv inverse + ActNorm inverse — is
  pre-folded into a single matmul-plus-bias (diag(exp(-logs)) @ W^-1) and kept in
  f32 at HIGHEST precision (invertibility must round-trip).
- conditional chains stream their precomputed per-step cond contributions
  (see stack.compute_u_contribs) from HBM via per-step async DMA.

Gradients never flow here: the fused path is attached by
FlowNetSpec.precompute_inference (serving only); training uses the XLA scan path,
which also remains the correctness oracle (tests/test_pallas_chain.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST

# debug toggles (read once at import)
import os as _os
_DBUF = _os.environ.get("HCFLOW_CHAIN_DBUF", "0") == "1"
_VLIMIT = int(_os.environ.get("HCFLOW_CHAIN_VLIMIT_MB", "0"))

# conv1 as ONE stacked-tap matmul (K = 9*c1) instead of 9 skinny K=c1 dots:
# lifts MXU contraction depth 9x at the cost of a 9-tap concat's value
# liveness (9 * c1 * N f32, ~1.4 MB at the flagship shape).
# MEASURED round 4: DOES NOT COMPILE on current Mosaic — the 9 rolled bf16
# taps carry distinct sublane/lane offsets from pltpu.roll, and the dim-0
# concatenate fails with "Not implemented: result/input offset mismatch on
# non-concat dimension" (error string recorded in BENCHMARKS.md round-4
# sweep).  Would
# need a per-tap layout canonicalization (copy through arithmetic), which
# re-serializes the roll/dot overlap the kernel relies on.  Kept off.
_C1STACK = _os.environ.get("HCFLOW_CHAIN_C1STACK", "0") == "1"

# Per-cell VMEM ceiling for choosing the fused path; configs whose buffers would not
# fit (e.g. f32 x8 level-0 at large spatial sizes) fall back to the XLA scan path.
VMEM_BUDGET = 14 * 2**20


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static description of one homogeneous inverse chain (Affine+FCN+invconv)."""

    K: int  # number of flow steps
    c: int  # channels of z
    hidden: int  # FCN hidden width
    H: int
    W: int
    cond: bool  # hoisted cond contributions streamed per step
    compute_dtype: Optional[str] = None  # 'bfloat16' => coupling net matmuls in bf16

    @property
    def c1(self) -> int:
        return self.c // 2

    @property
    def c2(self) -> int:
        return self.c - self.c // 2

    @property
    def fout(self) -> int:
        return 2 * self.c2

    @property
    def sp(self) -> int:  # per-tap slab rows (8-aligned so slab slices stay tiled)
        return _rup(self.fout, 8)

    @property
    def N(self) -> int:
        return self.H * self.W

    @property
    def net_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    # ------------------------------------------------------------- VMEM budgeting
    @property
    def tap_group(self) -> int:
        """Taps per conv3 output-scatter matmul, sized so the P buffer stays small."""
        bytes_per = jnp.dtype(self.net_dtype).itemsize
        budget = 20 * 2**20
        g = max(1, budget // max(1, self.sp * self.N * bytes_per))
        return int(min(9, g))

    def vmem_estimate(self) -> int:
        """Rough per-cell VMEM footprint in bytes (buffers + packed weights)."""
        f32, net = 4, jnp.dtype(self.net_dtype).itemsize
        n = self.N
        buf = 0
        buf += 4 * _rup(max(self.c1, self.c2), 8) * n * f32  # z1/z2 + next
        buf += 2 * self.hidden * n * net  # h1, h2
        buf += self.tap_group * self.sp * n * net  # P group
        buf += _rup(self.fout, 8) * n * f32  # p accumulator
        if self.cond:
            buf += 2 * self.hidden * n * net  # double-buffered uc scratch
        w = self.K * (
            9 * self.hidden * _rup(self.c1, 8)
            + self.hidden * self.hidden
            + 9 * self.sp * self.hidden
        ) * net + self.K * self.c * self.c * f32
        return buf + w


# --------------------------------------------------------------------------- packing
def pack_inverse_chain(spec: ChainSpec, stacked: dict) -> dict:
    """Pre-pack a stacked step-param pytree into kernel-ready dense arrays.

    Expects the stacked params of flow/stack.py (coupling kind 'Affine', nn 'FCN',
    permutation 'invconv') with invconv inverses already attached
    (stack._augment_invconv / invconv.precompute).
    """
    nd = spec.net_dtype
    cpl = stacked["coupling"]["f"]
    K, c1, c2, hid, fout, sp = spec.K, spec.c1, spec.c2, spec.hidden, spec.fout, spec.sp

    # conv1: (K,3,3,fin,hid); z-part = first c1 input channels (f_input = cat(z1, u))
    w1 = cpl["conv1"]["w"][:, :, :, :c1, :]
    w1 = jnp.transpose(w1, (0, 1, 2, 4, 3)).reshape(K, 9, hid, c1).astype(nd)
    if _C1STACK:  # (K, hid, 9*c1): one tall dot against the stacked-tap buffer
        w1 = jnp.transpose(w1, (0, 2, 1, 3)).reshape(K, hid, 9 * c1)
    b1 = cpl["conv1"]["actnorm"]["bias"].astype(jnp.float32)  # (K, hid)
    e1 = jnp.exp(cpl["conv1"]["actnorm"]["logs"]).astype(jnp.float32)

    w2 = jnp.transpose(cpl["conv2"]["w"][:, 0, 0], (0, 2, 1)).astype(nd)  # (K,hid,hid)
    b2 = cpl["conv2"]["actnorm"]["bias"].astype(jnp.float32)
    e2 = jnp.exp(cpl["conv2"]["actnorm"]["logs"]).astype(jnp.float32)

    # conv3 (Conv2dZeros): permute even/odd outputs to [shift | scale] blocks, pad to
    # sp rows, fold the exp(3*logs) gain into per-row scale + bias applied post-matmul.
    perm = jnp.concatenate([jnp.arange(0, fout, 2), jnp.arange(1, fout, 2)])
    w3 = cpl["conv3"]["w"][..., perm]  # (K,3,3,hid,fout)
    w3 = jnp.transpose(w3, (0, 1, 2, 4, 3))  # (K,3,3,fout,hid)
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 0), (0, sp - fout), (0, 0)))
    w3 = w3.reshape(K, 9, sp, hid).astype(nd)
    g3 = jnp.exp(3.0 * cpl["conv3"]["logs"][:, perm]).astype(jnp.float32)
    bg3 = (cpl["conv3"]["b"][:, perm] * g3).astype(jnp.float32)
    g3 = jnp.pad(g3, ((0, 0), (0, sp - fout)))
    bg3 = jnp.pad(bg3, ((0, 0), (0, sp - fout)))

    # invconv inverse folded with inverse actnorm: x = diag(exp(-logs)) @ W^-1 @ y - b
    winv = stacked["invconv"]["w_inv"]  # (K, c, c)
    an_s = jnp.exp(-stacked["actnorm"]["logs"])  # (K, c)
    an_b = stacked["actnorm"]["bias"]  # (K, c)
    wtail = (an_s[:, :, None] * winv).astype(jnp.float32)
    return {
        "w1": w1, "b1": b1, "e1": e1,
        "w2": w2, "b2": b2, "e2": e2,
        "w3": w3, "g3": g3, "bg3": bg3,
        "wt11": wtail[:, :c1, :c1], "wt12": wtail[:, :c1, c1:],
        "wt21": wtail[:, c1:, :c1], "wt22": wtail[:, c1:, c1:],
        "ab1": an_b[:, :c1].astype(jnp.float32),
        "ab2": an_b[:, c1:].astype(jnp.float32),
    }


_PACK_ORDER = (
    "w1", "b1", "e1", "w2", "b2", "e2", "w3", "g3", "bg3",
    "wt11", "wt12", "wt21", "wt22", "ab1", "ab2",
)


# ---------------------------------------------------------------------------- kernel
def _atan(x):
    """f32 arctan (Mosaic has no atan primitive): Cephes-style range reduction to
    |t| <= tan(pi/8), then an odd minimax polynomial — ~1e-7 relative error."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095  # tan(3*pi/8)
    mid = ax > 0.4142135623730951  # tan(pi/8)
    safe = jnp.maximum(ax, 1e-30)
    t = jnp.where(big, -1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(
        big,
        jnp.float32(jnp.pi / 2),
        jnp.where(mid, jnp.float32(jnp.pi / 4), jnp.float32(0.0)),
    )
    z = t * t
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
    p = p - 3.33329491874e-1
    return jnp.sign(x) * (base + t + t * z * p)


def _dot(a, b, nd):
    """(M,K)@(K,N) on the MXU; f32 accumulate; HIGHEST precision for f32 operands."""
    prec = None if nd == jnp.bfloat16 else _HIGHEST
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _make_kernel(spec: ChainSpec):
    K, c1, c2, hid = spec.K, spec.c1, spec.c2, spec.hidden
    fout, sp, H, W, N = spec.fout, spec.sp, spec.H, spec.W, spec.N
    nd = spec.net_dtype
    tap_group = spec.tap_group
    groups = [(g, min(g + tap_group, 9)) for g in range(0, 9, tap_group)]

    from .pallas_util import make_tap_masks, tap_roll as _tap_roll

    def kernel(*refs):
        if spec.cond:
            (z1i, z2i, uc_hbm, w1, b1, e1, w2, b2, e2, w3, g3, bg3,
             wt11, wt12, wt21, wt22, ab1, ab2, z1o, z2o,
             z1b, z2b, h1, h2, pg, pacc, ucb, sem) = refs
        else:
            (z1i, z2i, w1, b1, e1, w2, b2, e2, w3, g3, bg3,
             wt11, wt12, wt21, wt22, ab1, ab2, z1o, z2o,
             z1b, z2b, h1, h2, pg, pacc) = refs

        b = pl.program_id(0)
        masks = make_tap_masks(H, W)

        def tap_roll(x, t):
            return _tap_roll(x, t, H, W)

        z1b[:c1, :] = z1i[0]
        z2b[:c2, :] = z2i[0]

        if spec.cond:
            # double-buffered uc stream: prefetch step k-1 while computing step k
            def uc_dma(k):
                slot = (k % 2) if _DBUF else 0
                return pltpu.make_async_copy(
                    uc_hbm.at[b * K + k], ucb.at[slot], sem.at[slot]
                )

            if _DBUF:
                uc_dma(K - 1).start()

        for k in reversed(range(K)):
            if spec.cond and not _DBUF:
                uc_dma(k).start()
            if spec.cond and _DBUF and k > 0:
                uc_dma(k - 1).start()

            # conv1: input-gather over 9 taps of the tiny z1
            z1 = z1b[:c1, :]
            if _C1STACK:
                sv = jnp.concatenate(
                    [(tap_roll(z1, t) * masks[t]).astype(nd) for t in range(9)],
                    axis=0,
                )  # (9*c1, N)
                acc = _dot(w1[k], sv, nd)
            else:
                acc = jnp.zeros((hid, N), jnp.float32)
                for t in range(9):
                    zs = tap_roll(z1, t) * masks[t]
                    acc = acc + _dot(w1[k, t], zs.astype(nd), nd)
            if spec.cond:
                uc_dma(k).wait()
                acc = acc + ucb[(k % 2) if _DBUF else 0][:, :N].astype(jnp.float32)
            h1[...] = (
                jax.nn.relu((acc + b1[k][:, None]) * e1[k][:, None])
            ).astype(h1.dtype)

            # conv2 (1x1) + actnorm + relu
            h = _dot(w2[k], h1[...], nd)
            h2[...] = (
                jax.nn.relu((h + b2[k][:, None]) * e2[k][:, None])
            ).astype(h2.dtype)

            # conv3: output-scatter — tall matmul per tap group, then slab roll-adds
            pacc[...] = jnp.zeros((sp, N), jnp.float32)
            for g0, g1 in groups:
                ng = g1 - g0
                wg = w3[k, g0:g1].reshape(ng * sp, hid)
                pg[: ng * sp, :] = _dot(wg, h2[...], nd).astype(pg.dtype)
                for t in range(g0, g1):
                    # Mosaic rotates require 32-bit data: upcast the slab pre-roll
                    slab = pg[(t - g0) * sp : (t - g0 + 1) * sp, :].astype(jnp.float32)
                    pacc[...] += tap_roll(slab, t) * masks[t]
            p = pacc[...] * g3[k][:, None] + bg3[k][:, None]

            # affine inverse: z2 = z2 * exp(-logscale) - shift
            shift, scale = p[:c2, :], p[c2:fout, :]
            ls = 0.318 * _atan(2.0 * scale)
            z2 = z2b[:c2, :] * jnp.exp(-ls) - shift

            # fused invconv^-1 + actnorm^-1 (f32 HIGHEST: invertible path)
            z1 = z1b[:c1, :]
            z1n = _dot(wt11[k], z1, None) + _dot(wt12[k], z2, None) - ab1[k][:, None]
            z2n = _dot(wt21[k], z1, None) + _dot(wt22[k], z2, None) - ab2[k][:, None]
            z1b[:c1, :] = z1n
            z2b[:c2, :] = z2n

        z1o[0] = z1b[:c1, :]
        z2o[0] = z2b[:c2, :]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(spec: ChainSpec, B: int, interpret: bool):
    nd = spec.net_dtype
    N, c1, c2, hid, sp = spec.N, spec.c1, spec.c2, spec.hidden, spec.sp
    c1p, c2p = _rup(c1, 8), _rup(c2, 8)

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, c1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if spec.cond:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # uc stays in HBM
    in_specs += [vm()] * len(_PACK_ORDER)

    out_specs = (
        pl.BlockSpec((1, c1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((c1p, N), jnp.float32),  # z1 working buffer
        pltpu.VMEM((c2p, N), jnp.float32),  # z2 working buffer
        pltpu.VMEM((hid, N), nd),  # h1
        pltpu.VMEM((hid, N), nd),  # h2
        pltpu.VMEM((spec.tap_group * sp, N), nd),  # conv3 tap-group product
        pltpu.VMEM((sp, N), jnp.float32),  # conv3 scatter accumulator
    ]
    if spec.cond:
        # DMA slices must be lane-tile (128) aligned: the staged uc array and its
        # VMEM landing buffers carry N padded up to a 128 multiple; two slots for
        # the prefetch pipeline.
        scratch += [
            pltpu.VMEM((2, hid, _rup(N, 128)), nd),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    flops_step = 2 * N * hid * (9 * c1 + hid + 9 * sp) + 2 * N * spec.c * spec.c
    return pl.pallas_call(
        _make_kernel(spec),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, c1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, c2, N), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=_VLIMIT * 2**20)
            if _VLIMIT else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=spec.K * flops_step, bytes_accessed=4 * B * spec.c * N,
            transcendentals=spec.K * N * (hid + c2),
        ),
        interpret=interpret,
    )


def inverse_chain(spec: ChainSpec, packed: dict, z: jnp.ndarray, uc=None,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """Run the fused inverse chain. z: NHWC (B, H, W, c).  uc (required iff
    spec.cond): hoisted cond contributions, either (K, B, H, W, hidden) from
    stack.compute_u_contribs or pre-staged (B*K, hidden, N_pad128) from
    stack.compute_u_contribs_packed.  Returns NHWC."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = z.shape[0]
    zt = jnp.transpose(z.astype(jnp.float32), (0, 3, 1, 2)).reshape(B, spec.c, spec.N)
    args = [zt[:, : spec.c1], zt[:, spec.c1 :]]
    if spec.cond:
        np_ = _rup(spec.N, 128)
        if uc.ndim == 5:
            u = jnp.transpose(uc, (1, 0, 4, 2, 3)).reshape(
                B * spec.K, spec.hidden, spec.N
            )
            if np_ != spec.N:
                u = jnp.pad(u, ((0, 0), (0, 0), (0, np_ - spec.N)))
        else:
            u = uc
            assert u.shape == (B * spec.K, spec.hidden, np_), u.shape
        args.append(u.astype(spec.net_dtype))
    args += [packed[k] for k in _PACK_ORDER]
    z1, z2 = _build_call(spec, B, interpret)(*args)
    out = jnp.concatenate([z1, z2], axis=1).reshape(B, spec.c, spec.H, spec.W)
    return jnp.transpose(out, (0, 2, 3, 1))


def supported(step_spec) -> bool:
    """The fused kernel covers the SR configs: Affine coupling + FCN + invconv."""
    return (
        step_spec.flow_permutation == "invconv"
        and step_spec.flow_coupling == "Affine"
        and step_spec.nn_module == "FCN"
        and not step_spec.lu_decomposed
    )
