"""Fused inverse kernel for the RESCALING main chains (Affine3shift + DenseBlock).

Behavioral reference: /root/reference/codes/models/modules/FlowStep.py:53-64 with
coupling AffineCoupling3shift (AffineCouplings.py:122-160, the LRvsothers
alternation) and nn_module DenseBlock (Basic.py:329-358), run K times per level
with flow_permutation "none" — the rescaling configuration
(train_Rescaling_DF2K_4X_HCFlow.yml).  The SR chain kernel (pallas_chain.py)
cannot cover these: different coupling split (3 | c-3 alternating), a 5-conv
dense block instead of the 3-conv FCN, and no invconv.

Why a second chain kernel: the scoping run (tools/scope_rescaling_kernel.py,
BENCHMARKS.md round-5) shows the main chains are 37% of the rescaling reverse's
FLOPs but 46% of its bytes — the most memory-bound segment and the only one
still running as a per-op XLA loop once encoders (pallas_rdb) and split-off
chains (pallas_chain) are fused.

Same layout playbook as pallas_chain.py: z as (C, H*W) with channels in
sublanes and flattened space streaming through lanes; 3x3 convs are 9
rolled-and-masked taps feeding MXU matmuls.  The dense block runs in the
SCATTER form (nets.apply_rdb_scatter / pallas_rdb.py): one accumulator holds
all five conv outputs as row blocks [x1|x2|x3|x4|out]; each source feature
(the coupling input, then x1..x4) contributes 9 tap-matmuls into its row range
acc[s*gc:], so a feature is read once and never re-concatenated.  Per step:

- even k (lr_vs_others=True): net input = z[:3]; dense block emits
  2*(c-3) rows pre-permuted at pack time into contiguous [shift | scale]
  blocks (the reference's even/odd "cross" split becomes a conv5 weight
  permutation); inverse affine z2 = z2 * exp(-0.318*atan(2*scale)) - shift.
- odd k: net input = z[3:]; 3 shift rows; z1 = z1 - shift (the reference's
  reverse path ignores cond here, AffineCouplings.py:152 — and the main
  chains have no cond at all).
- every k: ActNorm inverse z = z * exp(-logs) - bias, folded per-channel.
  The chain's logdet is data-independent (Affine3shift.inverse contributes
  nothing by reference convention; ActNorm contributes -sum(logs)*H*W), so it
  is computed analytically at pack time — nothing leaves the kernel but z.

Even/odd steps have different weight shapes, so steps are stacked PER PARITY
(evens (ceil(K/2), ...), odds (K//2, ...)) and the unrolled K loop indexes
k//2 statically.  The invertible z path stays f32 (HIGHEST); the dense-block
matmuls follow compute_dtype like the other kernels.

Serving-only (no VJP), attached by FlowNetSpec.precompute_inference behind the
HCFLOW_CHAIN3S env gate (default off this round: the on-chip measurement slot
is tools/bench_rescaling.py under the round-5 supervisor; training and the
correctness oracle remain the unrolled XLA step loop,
tests/test_pallas_chain3s.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_chain import _atan, _dot
from .pallas_util import make_tap_masks, tap_roll as _tap_roll

# Rollout gate: 0 = XLA unrolled loop (shipped default), 1 = fused kernel where
# the AOT probe admits it.  Flip after the on-chip A/B measurement.
ENABLED = _os.environ.get("HCFLOW_CHAIN3S", "0") == "1"

# Python-side estimate gate (same role as pallas_chain.VMEM_BUDGET); the AOT
# compile probe below is the sound gate — scoped-VMEM demand is not monotone
# in shape (pallas_rdb.kernel_compiles docstring).
VMEM_BUDGET = 15 * 2**20


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class Chain3sSpec:
    """One alternating Affine3shift/DenseBlock chain (no permutation, no cond)."""

    K: int  # number of flow steps; step 0 is lr_vs_others=True
    c: int  # channels of z (12 / 48 at the shipped rescaling topology)
    gc: int  # dense-block growth channels (= hidden_channels, 32)
    H: int
    W: int
    compute_dtype: Optional[str] = None

    @property
    def c2(self) -> int:
        return self.c - 3

    @property
    def n_even(self) -> int:
        return (self.K + 1) // 2

    @property
    def n_odd(self) -> int:
        return self.K // 2

    @property
    def sp_e(self) -> int:  # padded conv5 rows, even steps (shift|scale blocks)
        return _rup(2 * self.c2, 8)

    @property
    def sp_o(self) -> int:  # padded conv5 rows, odd steps (3 shift rows)
        return 8

    @property
    def N(self) -> int:
        return self.H * self.W

    @property
    def net_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def _rows(self, sp: int) -> int:
        return 4 * self.gc + sp

    def vmem_estimate(self) -> int:
        f32, net = 4, jnp.dtype(self.net_dtype).itemsize
        n = self.N
        buf = (8 + _rup(self.c2, 8)) * n * f32  # z working buffers
        buf += 4 * self.gc * n * f32  # x1..x4 (f32: rolled pre-cast)
        buf += self._rows(max(self.sp_e, self.sp_o)) * n * f32  # scatter acc
        w = 0
        for n_par, cin, sp in (
            (self.n_even, 3, self.sp_e),
            (self.n_odd, self.c2, self.sp_o),
        ):
            rows = self._rows(sp)
            per = 9 * (rows * cin + sum((rows - s * self.gc) * self.gc for s in range(1, 5)))
            w += n_par * per * net
        return buf + w


# --------------------------------------------------------------------------- packing
def _scatter_weights(f_params: dict, cin: int, gc: int, sp: int, perm, nd):
    """Dense-block weights re-sliced by SOURCE feature (scatter form).

    Returns ([w_s0..w_s4], [b1..b4], b5p): w_s is (9, rows_s, cin_s) where
    rows_s = 4*gc + sp - s*gc; conv5's output axis is permuted by ``perm``
    (identity for odd steps) and zero-padded to sp rows.
    """
    ws = [f_params[f"conv{i}"]["w"] for i in range(1, 6)]  # (3,3,ci,co) HWIO
    b5 = f_params["conv5"]["b"]
    if perm is not None:
        ws = ws[:4] + [ws[4][..., perm]]
        b5 = b5[perm]
    fout = ws[4].shape[-1]
    ws[4] = jnp.pad(ws[4], ((0, 0), (0, 0), (0, 0), (0, sp - fout)))
    b5p = jnp.pad(b5, (0, sp - fout)).astype(jnp.float32)

    out = []
    for s in range(5):
        lo = 0 if s == 0 else cin + (s - 1) * gc
        width = cin if s == 0 else gc
        w = jnp.concatenate([w[:, :, lo : lo + width, :] for w in ws[s:]], axis=-1)
        w = jnp.transpose(w, (0, 1, 3, 2)).reshape(9, w.shape[-1], width)
        out.append(w.astype(nd))
    bs = [f_params[f"conv{i}"]["b"].astype(jnp.float32) for i in range(1, 5)]
    return out, bs, b5p


def pack_inverse_chain3s(spec: Chain3sSpec, main: list) -> dict:
    """Pre-pack the per-step param list (flownet's alternating main chain) into
    parity-stacked kernel-ready arrays + the analytic logdet sum."""
    gc, c2 = spec.gc, spec.c2
    perm_e = jnp.concatenate(
        [jnp.arange(0, 2 * c2, 2), jnp.arange(1, 2 * c2, 2)]
    )
    packed: dict = {}
    for tag, ks, cin, sp, perm in (
        ("e", range(0, spec.K, 2), 3, spec.sp_e, perm_e),
        ("o", range(1, spec.K, 2), c2, spec.sp_o, None),
    ):
        per_step = [
            _scatter_weights(main[k]["coupling"]["f"], cin, gc, sp, perm, spec.net_dtype)
            for k in ks
        ]
        for s in range(5):
            packed[f"w{tag}{s}"] = jnp.stack([p[0][s] for p in per_step])
        for i in range(4):
            packed[f"b{tag}{i + 1}"] = jnp.stack([p[1][i] for p in per_step])
        packed[f"b{tag}5"] = jnp.stack([p[2] for p in per_step])

    an_s = jnp.stack([jnp.exp(-main[k]["actnorm"]["logs"]) for k in range(spec.K)])
    an_b = jnp.stack([main[k]["actnorm"]["bias"] for k in range(spec.K)])
    packed["an_s1"] = an_s[:, :3].astype(jnp.float32)
    packed["an_b1"] = an_b[:, :3].astype(jnp.float32)
    packed["an_s2"] = an_s[:, 3:].astype(jnp.float32)
    packed["an_b2"] = an_b[:, 3:].astype(jnp.float32)
    # analytic logdet of the whole inverse chain (see module docstring)
    packed["logsum"] = sum(
        jnp.sum(main[k]["actnorm"]["logs"]) for k in range(spec.K)
    ).astype(jnp.float32)
    return packed


_PACK_ORDER = tuple(
    [f"w{t}{s}" for t in "eo" for s in range(5)]
    + [f"b{t}{i}" for t in "eo" for i in range(1, 6)]
    + ["an_s1", "an_b1", "an_s2", "an_b2"]
)


# ---------------------------------------------------------------------------- kernel
def _make_kernel(spec: Chain3sSpec):
    K, c2, gc, H, W, N = spec.K, spec.c2, spec.gc, spec.H, spec.W, spec.N
    nd = spec.net_dtype

    def kernel(*refs):
        (z1i, z2i,
         we0, we1, we2, we3, we4, wo0, wo1, wo2, wo3, wo4,
         be1, be2, be3, be4, be5, bo1, bo2, bo3, bo4, bo5,
         an_s1, an_b1, an_s2, an_b2,
         z1o, z2o, z1b, z2b, x1, x2, x3, x4, acc) = refs

        masks = make_tap_masks(H, W)

        def tap(x, t):
            return (_tap_roll(x, t, H, W) * masks[t]).astype(nd)

        z1b[:3, :] = z1i[0]
        z2b[:c2, :] = z2i[0]

        for k in reversed(range(K)):
            even = k % 2 == 0
            idx = k // 2
            if even:
                cin, sp = 3, spec.sp_e
                wsrc = (we0, we1, we2, we3, we4)
                bs, b5 = (be1, be2, be3, be4), be5
                xin = z1b[:3, :]
            else:
                cin, sp = c2, spec.sp_o
                wsrc = (wo0, wo1, wo2, wo3, wo4)
                bs, b5 = (bo1, bo2, bo3, bo4), bo5
                xin = z2b[:c2, :]
            rows = 4 * gc + sp

            # dense block, scatter form: source 0 fills all row blocks, then
            # each materialized feature adds its contributions to later blocks
            a = jnp.zeros((rows, N), jnp.float32)
            for t in range(9):
                a = a + _dot(wsrc[0][idx, t], tap(xin, t), nd)
            acc[:rows, :] = a
            feats = (x1, x2, x3, x4)
            for s in range(1, 5):
                xi = jax.nn.leaky_relu(
                    acc[(s - 1) * gc : s * gc, :] + bs[s - 1][idx][:, None], 0.2
                )
                feats[s - 1][...] = xi
                lo = s * gc
                a = jnp.zeros((rows - lo, N), jnp.float32)
                for t in range(9):
                    a = a + _dot(wsrc[s][idx, t], tap(feats[s - 1][...], t), nd)
                acc[lo:rows, :] += a
            p = acc[4 * gc : rows, :] + b5[idx][:, None]

            if even:  # affine inverse of z2 from [shift | scale] blocks
                shift, scale = p[:c2, :], p[c2 : 2 * c2, :]
                ls = 0.318 * _atan(2.0 * scale)
                z2b[:c2, :] = z2b[:c2, :] * jnp.exp(-ls) - shift
            else:  # shift-only inverse of the 3 LR channels
                z1b[:3, :] = z1b[:3, :] - p[:3, :]

            # ActNorm inverse on all channels
            z1b[:3, :] = z1b[:3, :] * an_s1[k][:, None] - an_b1[k][:, None]
            z2b[:c2, :] = z2b[:c2, :] * an_s2[k][:, None] - an_b2[k][:, None]

        z1o[0] = z1b[:3, :]
        z2o[0] = z2b[:c2, :]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(spec: Chain3sSpec, B: int, interpret: bool):
    N, c2, gc = spec.N, spec.c2, spec.gc
    rows = 4 * gc + max(spec.sp_e, spec.sp_o)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ] + [vm()] * len(_PACK_ORDER)
    out_specs = (
        pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((8, N), jnp.float32),  # z1 (3 live rows)
        pltpu.VMEM((_rup(c2, 8), N), jnp.float32),  # z2
        pltpu.VMEM((gc, N), jnp.float32),  # x1 (f32: lane rolls need 32-bit)
        pltpu.VMEM((gc, N), jnp.float32),  # x2
        pltpu.VMEM((gc, N), jnp.float32),  # x3
        pltpu.VMEM((gc, N), jnp.float32),  # x4
        pltpu.VMEM((rows, N), jnp.float32),  # scatter accumulator
    ]
    flops = 0
    for n_par, cin, sp in ((spec.n_even, 3, spec.sp_e), (spec.n_odd, c2, spec.sp_o)):
        r = 4 * gc + sp
        per = 2 * N * 9 * (r * cin + sum((r - s * gc) * gc for s in range(1, 5)))
        flops += n_par * per
    return pl.pallas_call(
        _make_kernel(spec),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
            jax.ShapeDtypeStruct((B, c2, N), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * spec.c * N,
            transcendentals=spec.n_even * N * c2 * 2,
        ),
        interpret=interpret,
    )


_PROBE_CACHE: dict = {}


def chain_compiles(spec: Chain3sSpec) -> bool:
    """AOT compile probe (same rationale as pallas_rdb.kernel_compiles: Mosaic's
    scoped-VMEM demand is not predictable in closed form).  Definitive outcomes
    are cached; transient infra errors fall back without caching."""
    if jax.default_backend() != "tpu":
        return True
    if spec in _PROBE_CACHE:
        return _PROBE_CACHE[spec]
    nd, N = spec.net_dtype, spec.N
    args = [
        jax.ShapeDtypeStruct((1, 3, N), jnp.float32),
        jax.ShapeDtypeStruct((1, spec.c2, N), jnp.float32),
    ]
    gc, c2 = spec.gc, spec.c2
    for n_par, cin, sp in ((spec.n_even, 3, spec.sp_e), (spec.n_odd, c2, spec.sp_o)):
        rows = 4 * gc + sp
        for s in range(5):
            width = cin if s == 0 else gc
            args.append(jax.ShapeDtypeStruct((n_par, 9, rows - s * gc, width), nd))
    for n_par, sp in ((spec.n_even, spec.sp_e), (spec.n_odd, spec.sp_o)):
        args += [jax.ShapeDtypeStruct((n_par, gc), jnp.float32)] * 4
        args.append(jax.ShapeDtypeStruct((n_par, sp), jnp.float32))
    args += [jax.ShapeDtypeStruct((spec.K, 3), jnp.float32)] * 2
    args += [jax.ShapeDtypeStruct((spec.K, c2), jnp.float32)] * 2
    import logging

    log = logging.getLogger("base")
    try:
        jax.jit(_build_call(spec, 1, False)).lower(*args).compile()
        _PROBE_CACHE[spec] = True
        return True
    except Exception as e:  # noqa: BLE001 — classify; fall back either way
        msg = str(e).lower()
        if "vmem" in msg or "scoped" in msg:
            _PROBE_CACHE[spec] = False
            log.warning(
                f"chain3s kernel exceeds scoped-VMEM at {spec.H}x{spec.W} "
                f"(c={spec.c}, K={spec.K}); using the XLA step loop"
            )
        else:
            log.warning(
                f"chain3s compile probe failed at {spec.H}x{spec.W} with a "
                f"non-VMEM error ({type(e).__name__}); using the XLA step loop "
                "for this trace (will re-probe on the next one)"
            )
        return False


def inverse_chain(spec: Chain3sSpec, packed: dict, z: jnp.ndarray,
                  interpret: Optional[bool] = None):
    """Run the fused inverse chain.  z: NHWC (B, H, W, c).  Returns (NHWC,
    logdet_delta) where logdet_delta is the chain's analytic contribution."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = z.shape[0]
    zt = jnp.transpose(z.astype(jnp.float32), (0, 3, 1, 2)).reshape(B, spec.c, spec.N)
    args = [zt[:, :3], zt[:, 3:]] + [packed[k] for k in _PACK_ORDER]
    z1, z2 = _build_call(spec, B, interpret)(*args)
    out = jnp.concatenate([z1, z2], axis=1).reshape(B, spec.c, spec.H, spec.W)
    return jnp.transpose(out, (0, 2, 3, 1)), -packed["logsum"] * (spec.H * spec.W)


def supported(lv, hidden_channels: int) -> bool:
    """Covers the rescaling main chains: alternating Affine3shift + DenseBlock,
    no permutation, no cond, both parities present, 8-aligned growth."""
    ms = lv.main_spec
    return (
        lv.alternate_lrvsothers
        and lv.n_main >= 2
        and ms.flow_permutation == "none"
        and ms.flow_coupling == "Affine3shift"
        and ms.nn_module == "DenseBlock"
        and ms.cond_channels is None
        and hidden_channels % 8 == 0
        and lv.channels > 3
    )
