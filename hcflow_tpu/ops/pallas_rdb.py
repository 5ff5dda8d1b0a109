"""Fused RRDB (residual-dense-block) Pallas kernel — the serving encoder hot path.

Behavioral reference: /root/reference/codes/models/modules/Basic.py:360-398
(ResidualDenseBlock_5C / RRDB), the FLOPs-dominant conditioning encoders
(ConditionalFlow.py:99-110).  After the flow-step chains were fused
(pallas_chain.py), these encoders are ~85% of the remaining reverse-pass time,
running at ~34 TFLOP/s under XLA: the dense block's 32/64-channel tensors waste
most of the 128 MXU/VPU lanes in an NHWC layout.

This kernel runs one whole RRDB (3 dense blocks + residuals) per invocation in a
channels-in-sublanes / spatial-in-lanes layout:

- the dense block is grouped by SOURCE feature (the scatter form of
  nets.apply_rdb_scatter): one accumulator holds all five conv outputs as row
  blocks [conv1 | conv2 | ... | conv5] = (4*gc+nf, N); each source feature
  contributes matmuls into its row range acc[s*gc:].
- 3x3 convs use im2col-by-sublane-stacking: 3 taps of the rolled+masked source
  stack into a (3*cin, N) buffer feeding tall matmuls with contraction depth
  96/192 — vs cin=32 skinny matmuls in the per-tap form.
- features x1..x4 materialize once each (lrelu of a finished accumulator row
  block) and stay in VMEM; the RRDB input/output move by explicit DMA.

Scoped-VMEM design (the round-3 fix for the fori-loop device fault): the round-2
kernel compiled with an explicit 72 MB ``vmem_limit_bytes`` because Mosaic kept
all 9 rolled tap temporaries of a source pass live at once (~45 MB scoped at
80x80).  Kernels carrying large explicit limits faulted (UNAVAILABLE) when the
full reverse graph ran inside ``lax.fori_loop`` while default-limit kernels in
the same loop were stable.  This version stays under the 16 MB compiler default:

- every rolled tap is staged through ONE fixed f32 scratch buffer in
  ``ROLL_CHUNK``-row slices (ref stores order the unrolled taps, so their value
  live-ranges end and Mosaic reuses the registers instead of stacking 9 copies);
- the working feature, residual base, DMA buffers and the accumulator are kept
  in the net dtype (bf16 for serving — matching the XLA trunk, whose residual
  adds are bf16 too; matmul partials still accumulate f32 inside the MXU and
  chunked ``+=`` round once per source contribution, ≤5 per row block);
- matmul output chunks are bounded to ``MM_CHUNK`` rows.

No ``vmem_limit_bytes`` is passed: the kernel compiles in the same default
scoped-VMEM regime as the chain kernels, which is the configuration proven
stable under ``lax.fori_loop`` at full model scale.

Serving-only (no VJP): attached by FlowNetSpec.precompute_inference(fused=True);
training and the correctness oracle stay on the XLA scatter path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST

# Explicit scoped-vmem limit (MB).  The kernel's measured scoped high-water is
# 19.53 MB at the flagship 80x80/nf64 bf16 shape (Mosaic compile report,
# chunk-size independent), so 20 MB is the tight bound — far below the >=32 MB
# regime where looped kernels faulted in round 2 (NOTES.md).  Overridable for
# experiments; 0 selects the 16 MB compiler default (flagship shape won't fit).
_VLIMIT = int(_os.environ.get("HCFLOW_RDB_VLIMIT_MB", "20"))

# Python-side gate: shapes whose estimate exceeds this fall back to the XLA
# trunk.  Calibration: vmem_estimate() returns 11.2 MB at the flagship
# 80x80/nf64 bf16 shape where Mosaic's measured scoped high-water is 19.53 MB
# (ratio ~1.75 — Mosaic's value-stack overhead on the unrolled conv chain), so
# the gate on the ESTIMATE scale is 11.5 MB, keeping the real requirement at or
# below the 20 MB compiled limit.  Strictly conservative: estimates that pass
# here compile.
VMEM_BUDGET = int(11.5 * 2**20)
MM_CHUNK = 64  # max matmul output rows per call (bounds f32 value temporaries)
ROLL_CHUNK = 16  # rows rolled/masked per staged slice (bounds roll temporaries)
LANE_CHUNK = 2048  # matmul lane (spatial) chunk; rolls need full lanes, dots don't


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class RDBSpec:
    nf: int
    gc: int
    H: int
    W: int
    compute_dtype: Optional[str] = None

    @property
    def N(self) -> int:
        return self.H * self.W

    @property
    def Np(self) -> int:  # lane-padded spatial size (DMA tile alignment)
        return _rup(self.H * self.W, 128)

    @property
    def rows(self) -> int:  # accumulator rows = all conv outputs
        return 4 * self.gc + self.nf

    @property
    def net_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def vmem_estimate(self) -> int:
        f32, net = 4, jnp.dtype(self.net_dtype).itemsize
        n = self.Np
        buf = self.rows * n * net  # acc
        buf += 3 * self.nf * n * net  # stack buffer (3 taps x max cin)
        buf += self.nf * n * net  # xbuf
        buf += self.nf * n * net  # xorig (RRDB residual base)
        buf += self.gc * n * f32  # xt
        # bounded value temporaries: the roll phase and the matmul phase do not
        # overlap; budget the larger (roll/mask slices at full lanes vs
        # lane-chunked stack read + matmul out + acc rmw)
        lc = min(LANE_CHUNK, n)
        roll_t = 4 * ROLL_CHUNK * n * f32
        mm_t = 3 * self.nf * lc * net + 3 * MM_CHUNK * lc * f32
        buf += max(roll_t, mm_t)
        srcs = self.nf + 4 * self.gc
        w = 3 * 9 * srcs * self.rows * net  # upper bound on packed weights
        return buf + w


def _src_slices(nf: int, gc: int):
    """(in_slice_start, cin, acc_row_offset, rows) per source feature 0..4."""
    out = []
    for s in range(5):
        cin = nf if s == 0 else gc
        start = 0 if s == 0 else nf + (s - 1) * gc
        off = s * gc
        rows = 4 * gc + nf - off
        out.append((start, cin, off, rows))
    return out


def pack_rrdb(spec: RDBSpec, rrdb_params: dict) -> dict:
    """Pack one RRDB's params (rdb1..rdb3, each conv1..5 HWIO) for the kernel.

    Per (rdb, source): weights grouped by tap triple, (3, rows_s, 3*cin_s), where
    rows_s concatenates this source's contribution to convs s+1..5 in conv order
    (matching the accumulator row blocks).
    """
    nd = spec.net_dtype
    nf, gc = spec.nf, spec.gc
    packed = {}
    for r in range(3):
        rdb = rrdb_params[f"rdb{r + 1}"]
        ws = [rdb[f"conv{j}"]["w"] for j in range(1, 6)]  # (3,3,cin_j,out_j)
        bs = [rdb[f"conv{j}"]["b"] for j in range(1, 6)]
        packed[f"b{r}"] = jnp.concatenate(bs).astype(jnp.float32)  # (rows,)
        for s, (start, cin, _off, _rows) in enumerate(_src_slices(nf, gc)):
            # source s feeds convs s+1..5 (conv indices s..4 in 0-base)
            w_s = jnp.concatenate(
                [ws[j][:, :, start : start + cin, :] for j in range(s, 5)], axis=-1
            )  # (3, 3, cin, rows_s)  — dims (dy, dx, cin, rows): (grp, tap) = (dy, dx)
            w_s = jnp.transpose(w_s, (0, 3, 1, 2)).reshape(
                3, w_s.shape[3], 3 * cin
            )  # (grp, rows, 3*cin) with tap-major K blocks
            packed[f"w{r}_{s}"] = w_s.astype(nd)
    return packed


_PACK_KEYS = tuple(
    [f"w{r}_{s}" for r in range(3) for s in range(5)] + [f"b{r}" for r in range(3)]
)


def _dot(a, b, nd):
    prec = None if nd == jnp.bfloat16 else _HIGHEST
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _make_kernel(spec: RDBSpec):
    nf, gc, H, W, N, Np = spec.nf, spec.gc, spec.H, spec.W, spec.N, spec.Np
    rows = spec.rows
    nd = spec.net_dtype
    slices = _src_slices(nf, gc)

    def kernel(*refs):
        xin = refs[0]  # HBM (B, nf, Np) net dtype
        wrefs = {k: r for k, r in zip(_PACK_KEYS, refs[1 : 1 + len(_PACK_KEYS)])}
        xout, xbuf, xorig, xt, acc, sbuf, sem = refs[1 + len(_PACK_KEYS) :]
        b = pl.program_id(0)

        n_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        col, row = n_idx % W, n_idx // W
        masks = []
        for t in range(9):
            dy, dx = t // 3 - 1, t % 3 - 1
            m = (
                (n_idx < N)
                & (col + dx >= 0) & (col + dx < W)
                & (row + dy >= 0) & (row + dy < H)
            )
            masks.append(m.astype(jnp.float32))

        pltpu.make_async_copy(xin.at[b], xorig, sem).start()
        pltpu.make_async_copy(xin.at[b], xorig, sem).wait()
        xbuf[...] = xorig[...]

        for r in range(3):
            # bias init + source contributions; all wide value temporaries are
            # chunked in both rows (MM_CHUNK) and lanes (LANE_CHUNK)
            for r0 in range(0, rows, MM_CHUNK):
                r1 = min(r0 + MM_CHUNK, rows)
                for n0 in range(0, Np, LANE_CHUNK):
                    n1 = min(n0 + LANE_CHUNK, Np)
                    acc[r0:r1, n0:n1] = jnp.broadcast_to(
                        wrefs[f"b{r}"][r0:r1][:, None], (r1 - r0, n1 - n0)
                    ).astype(nd)
            for s, (_start, cin, off, rows_s) in enumerate(slices):
                src = xbuf if s == 0 else xt  # xbuf is net dtype, xt is f32
                for g in range(3):
                    for i in range(3):
                        # roll over the PADDED lane dim; masks zero pad/boundary.
                        # ROLL_CHUNK row slices (upcast inline: pltpu.roll needs
                        # 32-bit data) keep each roll/mask temporary small and
                        # their live-ranges disjoint (scoped-VMEM).
                        t = 3 * g + i
                        dy, dx = t // 3 - 1, t % 3 - 1
                        offr = dy * W + dx
                        for c0 in range(0, cin, ROLL_CHUNK):
                            c1 = min(c0 + ROLL_CHUNK, cin)
                            v = src[c0:c1, :].astype(jnp.float32)
                            if offr:
                                v = pltpu.roll(v, (-offr) % Np, 1)
                            sbuf[i * cin + c0 : i * cin + c1, :] = (
                                v * masks[t]
                            ).astype(nd)
                    wg = wrefs[f"w{r}_{s}"]
                    for n0 in range(0, Np, LANE_CHUNK):
                        n1 = min(n0 + LANE_CHUNK, Np)
                        sv = sbuf[: 3 * cin, n0:n1]
                        for r0 in range(0, rows_s, MM_CHUNK):
                            r1 = min(r0 + MM_CHUNK, rows_s)
                            acc[off + r0 : off + r1, n0:n1] += _dot(
                                wg[g, r0:r1, :], sv, nd
                            ).astype(nd)
                if s < 4:
                    # x_{s+1} = lrelu(conv_{s+1} output) — its row block is complete
                    v = acc[s * gc : (s + 1) * gc, :].astype(jnp.float32)
                    xt[...] = jnp.where(v > 0, v, 0.2 * v)
            # RDB residual: out5 rows are the conv5 block
            xbuf[...] = (acc[4 * gc :, :] * 0.2 + xbuf[...]).astype(nd)
        # RRDB residual vs the ORIGINAL input, then DMA out
        xbuf[...] = (xbuf[...] * 0.2 + xorig[...]).astype(nd)
        pltpu.make_async_copy(xbuf, xout.at[b], sem).start()
        pltpu.make_async_copy(xbuf, xout.at[b], sem).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(spec: RDBSpec, B: int, interpret: bool):
    nd = spec.net_dtype
    Np, nf, gc = spec.Np, spec.nf, spec.gc
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    in_specs += [vm()] * len(_PACK_KEYS)
    scratch = [
        pltpu.VMEM((nf, Np), nd),  # xbuf (working feature)
        pltpu.VMEM((nf, Np), nd),  # xorig (RRDB residual base)
        pltpu.VMEM((gc, Np), jnp.float32),  # xt
        pltpu.VMEM((spec.rows, Np), nd),  # acc
        pltpu.VMEM((3 * nf, Np), nd),  # tap-stack buffer
        pltpu.SemaphoreType.DMA(()),
    ]
    srcs_k = 9 * (nf + 4 * gc)
    return pl.pallas_call(
        _make_kernel(spec),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((B, nf, Np), nd),
        scratch_shapes=scratch,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=_VLIMIT * 2**20)
            if _VLIMIT else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * spec.N * srcs_k * spec.rows // 2,  # rough (rows shrink)
            bytes_accessed=2 * B * nf * Np * jnp.dtype(nd).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def rrdb_apply(spec: RDBSpec, packed: dict, x_cn: jnp.ndarray,
               interpret: Optional[bool] = None) -> jnp.ndarray:
    """One fused RRDB on channel-major input (B, nf, Np) net-dtype (lane-padded)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x_cn.shape[0]
    args = [x_cn] + [packed[k] for k in _PACK_KEYS]
    return _build_call(spec, B, interpret)(*args)


def pack_rrdb_trunk(spec: RDBSpec, trunk_stacked: dict) -> list:
    """Pack an init_rrdb_trunk stack (leading nb axis) into per-RRDB kernel params."""
    nb = jax.tree.leaves(trunk_stacked)[0].shape[0]
    return [
        pack_rrdb(spec, jax.tree.map(lambda a: a[i], trunk_stacked))
        for i in range(nb)
    ]


def trunk_apply(spec: RDBSpec, packed_list: list, x_nhwc: jnp.ndarray,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused RRDB trunk on NHWC input: one layout transpose in, one out."""
    B, H, W, C = x_nhwc.shape
    in_dtype = x_nhwc.dtype
    x = jnp.transpose(x_nhwc.astype(spec.net_dtype), (0, 3, 1, 2)).reshape(
        B, C, H * W
    )
    if spec.Np != spec.N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, spec.Np - spec.N)))
    for packed in packed_list:
        x = rrdb_apply(spec, packed, x, interpret)
    x = x[:, :, : spec.N]
    return jnp.transpose(x.reshape(B, C, H, W), (0, 2, 3, 1)).astype(in_dtype)
