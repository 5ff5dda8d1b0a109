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

Scoped-VMEM design (round 3): Mosaic's scoped-VMEM high-water is dominated by
VALUE-STACK liveness — it keeps the rolled tap temporaries of a source pass live
across the matmul chain because that liveness IS its software pipelining (the
round-2 single-grid-cell kernel needed ~45 MB scoped at 80x80 and its perf
tracked the allowed limit).  This version splits the grid per dense block,
``grid=(B, 3)``: each grid cell runs ONE of the RRDB's 3 RDBs (weights stacked
with a leading RDB axis read dynamically via ``program_id(1)``), cutting the
kernel body — and with it Mosaic's value stack — 3x, down to a ~26-30 MB
compile at the flagship shape with f32 residual carries (bf16 carries fit in
19.5 MB but degrade parity to 5.9e-3; the f32 residual-carry chain matters).
Taps flow straight into the dot's K operand (no staging ref): Mosaic overlaps
the VPU rolls of group g+1 with the MXU dot of group g — the staged-ref variant
serialized them, 3x slower.

The kernel fits the flagship shape under the 16 MB compiler-DEFAULT scoped
limit (no explicit ``vmem_limit_bytes``): bf16 xorig/xt scratch (cast after the
f32 DMA; the XLA oracle keeps these bf16 anyway — parity 1.6e-3 rel) and 32-row
matmul chunks.  This is the round-3 root-cause fix for the fori-loop device
fault: kernels compiled with ANY explicit vmem limit above the default (18, 20,
22, 26, 30, 48, 72 MB all bisected) fault UNAVAILABLE when the full fused
reverse runs inside ``lax.fori_loop`` — even when actual usage fits in 16.26 MB
— while the same kernels are stable as single dispatches.  In the default
regime both patterns are stable and fast: 39 ms/iter in-graph (10.4 MP/s/chip)
vs 68 ms dispatch (6.1 MP/s, ~28 ms host overhead per call), so ``fused="all"``
is unconditional for both serving and looped contexts.

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

# Explicit scoped-vmem limit (MB) — EXPERIMENTS ONLY.  Default 0 = the 16 MB
# compiler default, the only regime proven lax.fori_loop-safe (round-3 bisect:
# explicit limits 18-72 MB all fault in-loop; NOTES.md).
_VLIMIT = int(_os.environ.get("HCFLOW_RDB_VLIMIT_MB", "0"))

# Fit-under-default mode (bf16 xorig/xt scratch + 32-row matmul chunks): the
# production default.  0 restores f32 scratch + MM_CHUNK 64 for experiments
# (needs HCFLOW_RDB_VLIMIT_MB >= ~26 to compile the flagship shape).
_FIT16 = _os.environ.get("HCFLOW_RDB_FIT16", "1") == "1"

# Grid-split granularity: "rdb" (default, grid=(B,3), one dense block per grid
# cell — the round-3 shipped form) or "src" (grid=(B,3,5), one SOURCE FEATURE
# per cell behind pl.when branches).  Rationale for "src" was: Mosaic's
# scoped-VMEM high-water tracks the kernel BODY's value-stack liveness, and perf
# tracks the pipelining headroom left under the 16 MB default (round-3 bisects,
# NOTES.md); shrinking the body another ~5x frees headroom for deeper pipelining
# at the same limit.  MEASURED on-chip round 4: NEGATIVE — the hypothesis
# inverts at the flagship 80x80 shape.  Mosaic pipelines the smaller body
# DEEPER and the scoped high-water RISES past the 16 MB default (the same
# non-monotonicity kernel_compiles() exists for), so the AOT probe fails, the
# L0 trunks fall back to XLA, and the bench drops to 4.73-4.79 MP/s (vs 10.44
# "rdb"; /tmp/rdb_sweep.jsonl, BENCHMARKS.md round-4 sweep).  Kept for probes.
_SPLIT = _os.environ.get("HCFLOW_RDB_SPLIT", "rdb")

# Matmul row-chunk override for on-chip sweeps (0 = mode default: 32 in FIT16,
# MM_CHUNK otherwise).
_MM_ENV = int(_os.environ.get("HCFLOW_RDB_MM", "0"))

# Resident-trunk mode (round-5 traffic restructure, VERDICT r4 #2): ONE
# pallas_call per RRDB trunk, grid=(B, nb*3) — residual carries stay in VMEM
# scratch across ALL the trunk's RRDBs (the per-RRDB form round-trips x through
# HBM between RRDBs: 2 DMAs x 26 MB each boundary at the flagship shape) and
# the 2*(nb-1) pallas_call boundaries per trunk disappear.  Weights stream one
# dense-block slice per grid step via grid-blocked BlockSpecs (auto
# double-buffered, ~0.5 MB/block — re-read per batch element, but at ~160 MB
# per flagship trunk call that is ~0.2 ms of fully-overlapped DMA).  The kernel
# BODY is identical to the per-RRDB form, so the scoped-VMEM footprint should
# match FIT16; gated by its own AOT compile probe.
_TRUNK = _os.environ.get("HCFLOW_RDB_TRUNK", "0") == "1"

# Python-side gate: shapes whose estimate exceeds this fall back to the XLA
# trunk.  Calibration: vmem_estimate() returns 19.1 MB at the flagship
# 80x80/nf64 bf16 shape, whose measured Mosaic requirement in FIT16 mode is
# 15.9 MB (16.26 before the bf16-xt shave) — just inside the 16 MB default.
# The gate passes estimates up to 19.2 MB so the flagship shape is the largest
# admitted; anything bigger falls back to the XLA trunk rather than risking a
# scoped-VMEM compile failure.
VMEM_BUDGET = int(19.2 * 2**20)
MM_CHUNK = 64  # max matmul output rows per call (bounds f32 value temporaries)


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
        buf = self.rows * n * f32  # acc (f32: partial-sum accumulation)
        buf += 3 * self.nf * n * net  # stack buffer (3 taps x max cin)
        buf += 2 * self.nf * n * f32  # xbuf + xorig (f32 residual carries)
        buf += self.gc * n * f32  # xt
        # bounded value temporaries: roll/mask chain + stack read + matmul out
        buf += 4 * self.nf * n * f32
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
    per_rdb = {s: [] for s in range(5)}
    biases = []
    for r in range(3):
        rdb = rrdb_params[f"rdb{r + 1}"]
        ws = [rdb[f"conv{j}"]["w"] for j in range(1, 6)]  # (3,3,cin_j,out_j)
        bs = [rdb[f"conv{j}"]["b"] for j in range(1, 6)]
        biases.append(jnp.concatenate(bs))
        for s, (start, cin, _off, _rows) in enumerate(_src_slices(nf, gc)):
            # source s feeds convs s+1..5 (conv indices s..4 in 0-base)
            w_s = jnp.concatenate(
                [ws[j][:, :, start : start + cin, :] for j in range(s, 5)], axis=-1
            )  # (3, 3, cin, rows_s)  — dims (dy, dx, cin, rows): (grp, tap) = (dy, dx)
            w_s = jnp.transpose(w_s, (0, 3, 1, 2)).reshape(
                3, w_s.shape[3], 3 * cin
            )  # (grp, rows, 3*cin) with tap-major K blocks
            per_rdb[s].append(w_s.astype(nd))
    # stacked over the 3 dense blocks: the kernel's grid dim picks [r] dynamically
    packed = {f"w{s}": jnp.stack(per_rdb[s]) for s in range(5)}  # (3, grp, rows_s, 3cin)
    # (3, 1, rows): the leading RDB index is read dynamically in-kernel, which
    # Mosaic only allows on an untiled leading dim (not the sublane dim of a 2-D)
    packed["b"] = jnp.stack(biases)[:, None, :].astype(jnp.float32)
    return packed


_PACK_KEYS = tuple([f"w{s}" for s in range(5)] + ["b"])


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
    mm = _MM_ENV or (32 if _FIT16 else MM_CHUNK)

    def kernel(*refs):
        xin = refs[0]  # HBM (B, nf, Np) f32
        wrefs = {k: r for k, r in zip(_PACK_KEYS, refs[1 : 1 + len(_PACK_KEYS)])}
        xout, xbuf, xorig, xt, acc, sem = refs[1 + len(_PACK_KEYS) :]
        b = pl.program_id(0)
        r = pl.program_id(1)  # dense block index: grid minor dim, sequential

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

        @pl.when(r == 0)
        def _load():
            pltpu.make_async_copy(xin.at[b], xbuf, sem).start()
            pltpu.make_async_copy(xin.at[b], xbuf, sem).wait()
            xorig[...] = xbuf[...].astype(xorig.dtype)

        # ---- one dense block (the body is 1/3 of the old unrolled kernel: the
        # Mosaic value stack, the scoped-VMEM driver, shrinks accordingly)
        for r0 in range(0, rows, mm):
            r1 = min(r0 + mm, rows)
            acc[r0:r1, :] = jnp.broadcast_to(
                wrefs["b"][r, 0, r0:r1][:, None], (r1 - r0, Np)
            )
        for s_i, (_start, cin, off, rows_s) in enumerate(slices):
            # value-flow im2col: the 3 rolled+masked taps of a group concat into
            # the dot's K operand directly (no staging ref) — Mosaic overlaps the
            # VPU rolls of group g+1 with the MXU dot of group g; the staged-ref
            # variant serialized them (3x slower, probe history BENCHMARKS.md)
            src_v = (xbuf[...] if s_i == 0 else xt[...].astype(jnp.float32))  # roll needs 32-bit
            for g in range(3):
                taps = []
                for i in range(3):
                    t = 3 * g + i
                    dy, dx = t // 3 - 1, t % 3 - 1
                    offr = dy * W + dx
                    v = pltpu.roll(src_v, (-offr) % Np, 1) if offr else src_v
                    taps.append((v * masks[t]).astype(nd))
                sv = jnp.concatenate(taps, axis=0)
                wg = wrefs[f"w{s_i}"]
                for r0 in range(0, rows_s, mm):
                    r1 = min(r0 + mm, rows_s)
                    acc[off + r0 : off + r1, :] += _dot(wg[r, g, r0:r1, :], sv, nd)
            if s_i < 4:
                # x_{s+1} = lrelu(conv_{s+1} output) — its row block is complete
                v = acc[s_i * gc : (s_i + 1) * gc, :]
                xt[...] = jnp.where(v > 0, v, 0.2 * v).astype(xt.dtype)
        # RDB residual: out5 rows are the conv5 block
        xbuf[...] = acc[4 * gc :, :] * 0.2 + xbuf[...]

        @pl.when(r == 2)
        def _store():
            # RRDB residual vs the ORIGINAL input, then DMA out
            xbuf[...] = xbuf[...] * 0.2 + xorig[...].astype(jnp.float32)
            pltpu.make_async_copy(xbuf, xout.at[b], sem).start()
            pltpu.make_async_copy(xbuf, xout.at[b], sem).wait()

    return kernel


def _make_kernel_src(spec: RDBSpec):
    """Per-source grid split: grid=(B, 3, 5), one source feature per cell.

    Same math as _make_kernel with the source loop lifted into the grid's
    sequential minor dim behind pl.when branches: only one branch executes per
    cell, so Mosaic's value stack spans a single source pass (the largest is
    source 0: three K=3*nf dots) instead of all five.  State (acc/xbuf/xt)
    persists in scratch across cells exactly as it does across the rdb dim.
    """
    nf, gc, H, W, N, Np = spec.nf, spec.gc, spec.H, spec.W, spec.N, spec.Np
    rows = spec.rows
    nd = spec.net_dtype
    slices = _src_slices(nf, gc)
    mm = _MM_ENV or (32 if _FIT16 else MM_CHUNK)

    def kernel(*refs):
        xin = refs[0]
        wrefs = {k: r for k, r in zip(_PACK_KEYS, refs[1 : 1 + len(_PACK_KEYS)])}
        xout, xbuf, xorig, xt, acc, sem = refs[1 + len(_PACK_KEYS) :]
        b = pl.program_id(0)
        r = pl.program_id(1)
        s = pl.program_id(2)

        n_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        col, row = n_idx % W, n_idx // W

        @pl.when((r == 0) & (s == 0))
        def _load():
            pltpu.make_async_copy(xin.at[b], xbuf, sem).start()
            pltpu.make_async_copy(xin.at[b], xbuf, sem).wait()
            xorig[...] = xbuf[...].astype(xorig.dtype)

        @pl.when(s == 0)
        def _init_acc():
            for r0 in range(0, rows, mm):
                r1 = min(r0 + mm, rows)
                acc[r0:r1, :] = jnp.broadcast_to(
                    wrefs["b"][r, 0, r0:r1][:, None], (r1 - r0, Np)
                )

        for s_i, (_start, _cin, off, rows_s) in enumerate(slices):

            @pl.when(s == s_i)
            def _source(s_i=s_i, off=off, rows_s=rows_s):
                src_v = xbuf[...] if s_i == 0 else xt[...].astype(jnp.float32)
                for g in range(3):
                    taps = []
                    for i in range(3):
                        t = 3 * g + i
                        dy, dx = t // 3 - 1, t % 3 - 1
                        m = (
                            (n_idx < N)
                            & (col + dx >= 0) & (col + dx < W)
                            & (row + dy >= 0) & (row + dy < H)
                        ).astype(jnp.float32)
                        offr = dy * W + dx
                        v = pltpu.roll(src_v, (-offr) % Np, 1) if offr else src_v
                        taps.append((v * m).astype(nd))
                    sv = jnp.concatenate(taps, axis=0)
                    wg = wrefs[f"w{s_i}"]
                    for r0 in range(0, rows_s, mm):
                        r1 = min(r0 + mm, rows_s)
                        acc[off + r0 : off + r1, :] += _dot(wg[r, g, r0:r1, :], sv, nd)
                if s_i < 4:
                    v = acc[s_i * gc : (s_i + 1) * gc, :]
                    xt[...] = jnp.where(v > 0, v, 0.2 * v).astype(xt.dtype)

        @pl.when(s == 4)
        def _rdb_residual():
            xbuf[...] = acc[4 * gc :, :] * 0.2 + xbuf[...]

        @pl.when((r == 2) & (s == 4))
        def _store():
            xbuf[...] = xbuf[...] * 0.2 + xorig[...].astype(jnp.float32)
            pltpu.make_async_copy(xbuf, xout.at[b], sem).start()
            pltpu.make_async_copy(xbuf, xout.at[b], sem).wait()

    return kernel


def _make_kernel_trunk(spec: RDBSpec, nbl: int):
    """Whole-trunk kernel: grid=(B, nbl*3), one dense block per cell, carries
    resident in scratch across ALL RRDBs of the trunk.  Weights arrive as
    grid-blocked refs (one dense-block slice per cell, streamed+double-buffered
    by the pipeline), so the body needs no dynamic RDB indexing at all."""
    nf, gc, H, W, N, Np = spec.nf, spec.gc, spec.H, spec.W, spec.N, spec.Np
    rows = spec.rows
    nd = spec.net_dtype
    slices = _src_slices(nf, gc)
    mm = _MM_ENV or (32 if _FIT16 else MM_CHUNK)
    last = nbl * 3 - 1

    def kernel(*refs):
        xin = refs[0]  # HBM (B, nf, Np) f32
        wrefs = {k: r for k, r in zip(_PACK_KEYS, refs[1 : 1 + len(_PACK_KEYS)])}
        xout, xbuf, xorig, xt, acc, sem = refs[1 + len(_PACK_KEYS) :]
        b = pl.program_id(0)
        j = pl.program_id(1)  # dense-block index over the whole trunk, sequential
        jm = jax.lax.rem(j, 3)  # position within the current RRDB

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

        @pl.when(j == 0)
        def _load():
            pltpu.make_async_copy(xin.at[b], xbuf, sem).start()
            pltpu.make_async_copy(xin.at[b], xbuf, sem).wait()

        @pl.when(jm == 0)
        def _rrdb_begin():
            # xorig = this RRDB's input (the RRDB residual base); runs after
            # _load at j==0, and on the in-VMEM carry at every later RRDB
            xorig[...] = xbuf[...].astype(xorig.dtype)

        for r0 in range(0, rows, mm):
            r1 = min(r0 + mm, rows)
            acc[r0:r1, :] = jnp.broadcast_to(
                wrefs["b"][0, 0, r0:r1][:, None], (r1 - r0, Np)
            )
        for s_i, (_start, cin, off, rows_s) in enumerate(slices):
            src_v = (xbuf[...] if s_i == 0 else xt[...].astype(jnp.float32))
            for g in range(3):
                taps = []
                for i in range(3):
                    t = 3 * g + i
                    dy, dx = t // 3 - 1, t % 3 - 1
                    offr = dy * W + dx
                    v = pltpu.roll(src_v, (-offr) % Np, 1) if offr else src_v
                    taps.append((v * masks[t]).astype(nd))
                sv = jnp.concatenate(taps, axis=0)
                wg = wrefs[f"w{s_i}"]
                for r0 in range(0, rows_s, mm):
                    r1 = min(r0 + mm, rows_s)
                    acc[off + r0 : off + r1, :] += _dot(wg[0, g, r0:r1, :], sv, nd)
            if s_i < 4:
                v = acc[s_i * gc : (s_i + 1) * gc, :]
                xt[...] = jnp.where(v > 0, v, 0.2 * v).astype(xt.dtype)
        xbuf[...] = acc[4 * gc :, :] * 0.2 + xbuf[...]

        @pl.when(jm == 2)
        def _rrdb_end():
            xbuf[...] = xbuf[...] * 0.2 + xorig[...].astype(jnp.float32)

        @pl.when(j == last)
        def _store():
            pltpu.make_async_copy(xbuf, xout.at[b], sem).start()
            pltpu.make_async_copy(xbuf, xout.at[b], sem).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call_trunk(spec: RDBSpec, B: int, nbl: int, interpret: bool):
    nd = spec.net_dtype
    Np, nf, gc = spec.Np, spec.nf, spec.gc
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    for _s, (_start, cin, _off, rows_s) in enumerate(_src_slices(nf, gc)):
        in_specs.append(
            pl.BlockSpec(
                (1, 3, rows_s, 3 * cin), lambda b, j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    in_specs.append(
        pl.BlockSpec((1, 1, spec.rows), lambda b, j: (j, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    scratch = [
        pltpu.VMEM((nf, Np), jnp.float32),  # xbuf (working feature, f32 carry)
        pltpu.VMEM((nf, Np), nd if _FIT16 else jnp.float32),  # xorig (RRDB base)
        pltpu.VMEM((gc, Np), nd if _FIT16 else jnp.float32),  # xt
        pltpu.VMEM((spec.rows, Np), jnp.float32),  # acc (f32 partial sums)
        pltpu.SemaphoreType.DMA(()),
    ]
    srcs_k = 9 * (nf + 4 * gc)
    return pl.pallas_call(
        _make_kernel_trunk(spec, nbl),
        grid=(B, nbl * 3),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((B, nf, Np), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=nbl * 3 * 2 * spec.N * srcs_k * spec.rows // 2,
            bytes_accessed=2 * B * nf * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


_TRUNK_PROBE_CACHE: dict = {}


def trunk_kernel_compiles(spec: RDBSpec, nbl: int) -> bool:
    """AOT compile probe for the resident-trunk kernel (same rationale as
    kernel_compiles: scoped-VMEM demand is not predictable in closed form)."""
    if jax.default_backend() != "tpu":
        return True
    key = (spec, nbl)
    if key in _TRUNK_PROBE_CACHE:
        return _TRUNK_PROBE_CACHE[key]
    nd = spec.net_dtype
    args = [jax.ShapeDtypeStruct((1, spec.nf, spec.Np), jnp.float32)]
    for _s, (_start, cin, _off, rows_s) in enumerate(_src_slices(spec.nf, spec.gc)):
        args.append(jax.ShapeDtypeStruct((nbl * 3, 3, rows_s, 3 * cin), nd))
    args.append(jax.ShapeDtypeStruct((nbl * 3, 1, spec.rows), jnp.float32))
    import logging

    log = logging.getLogger("base")
    try:
        jax.jit(_build_call_trunk(spec, 1, nbl, False)).lower(*args).compile()
        _TRUNK_PROBE_CACHE[key] = True
        return True
    except Exception as e:  # noqa: BLE001 — classify; fall back either way
        msg = str(e).lower()
        if "vmem" in msg or "scoped" in msg:
            _TRUNK_PROBE_CACHE[key] = False
            log.warning(
                f"resident-trunk kernel exceeds scoped-VMEM at {spec.H}x{spec.W} "
                f"(nf={spec.nf}, gc={spec.gc}, nb={nbl}); using per-RRDB calls"
            )
        else:
            log.warning(
                f"resident-trunk compile probe failed at {spec.H}x{spec.W} with "
                f"a non-VMEM error ({type(e).__name__}); using per-RRDB calls "
                "for this trace (will re-probe on the next one)"
            )
        return False


@functools.lru_cache(maxsize=None)
def _build_call(spec: RDBSpec, B: int, interpret: bool):
    nd = spec.net_dtype
    Np, nf, gc = spec.Np, spec.nf, spec.gc
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    in_specs += [vm()] * len(_PACK_KEYS)
    scratch = [
        pltpu.VMEM((nf, Np), jnp.float32),  # xbuf (working feature, f32 carry)
        pltpu.VMEM((nf, Np), nd if _FIT16 else jnp.float32),  # xorig (residual base)
        pltpu.VMEM((gc, Np), nd if _FIT16 else jnp.float32),  # xt
        pltpu.VMEM((spec.rows, Np), jnp.float32),  # acc (f32 partial sums)
        pltpu.SemaphoreType.DMA(()),
    ]
    srcs_k = 9 * (nf + 4 * gc)
    return pl.pallas_call(
        _make_kernel_src(spec) if _SPLIT == "src" else _make_kernel(spec),
        grid=(B, 3, 5) if _SPLIT == "src" else (B, 3),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((B, nf, Np), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=_VLIMIT * 2**20)
            if _VLIMIT and not _FIT16 else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * spec.N * srcs_k * spec.rows // 2,  # rough (rows shrink)
            bytes_accessed=2 * B * nf * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


_PROBE_CACHE: dict = {}

# Shapes measured compiling (and serving) on-device inside the default scoped
# limit — every encoder shape of the shipped x4/x8 flagship configs.  These
# skip the AOT probe so the production path never depends on remote-compile
# availability; novel shapes are probed before first use.  Keyed on net_dtype
# too: the fits-in-16MB evidence is specific to bf16 _FIT16 kernels, and the
# allowlist is bypassed entirely when _FIT16 is off or _VLIMIT is set (those
# modes change the kernel's scoped-VMEM footprint, so always probe).
_VALIDATED = {
    (512, 64, 32, "bfloat16"),
    (1664, 64, 32, "bfloat16"),
    (6400, 64, 32, "bfloat16"),
}


def kernel_compiles(spec: RDBSpec) -> bool:
    """AOT-probe that Mosaic can compile this shape inside the default scoped-VMEM
    limit.  Needed because scoped-VMEM demand is NOT monotone in shape (measured:
    80x80/nf64 fits the 16 MB default at 15.9 MB while 64x64 needs 18.39 MB —
    Mosaic pipelines smaller shapes deeper), so no closed-form estimate gate can
    be sound.  The probe compiles a B=1 program (per-grid-cell scoped usage is
    batch-independent), once per shape; on scoped-VMEM failure the caller falls
    back to the XLA trunk instead of crashing at dispatch.  Definitive outcomes
    (compiled / scoped-VMEM OOM) are cached; transient infra errors (e.g. a
    remote-compile transport failure) also fall back but are NOT cached so a
    later call can retry."""
    if jax.default_backend() != "tpu":
        return True  # interpret path has no scoped-VMEM constraint
    if (
        _FIT16
        and not _VLIMIT
        and _SPLIT == "rdb"  # fits-in-16MB evidence is specific to the shipped form
        and not _MM_ENV
        and (spec.Np, spec.nf, spec.gc, jnp.dtype(spec.net_dtype).name) in _VALIDATED
    ):
        return True
    if spec in _PROBE_CACHE:
        return _PROBE_CACHE[spec]
    nd = spec.net_dtype
    args = [jax.ShapeDtypeStruct((1, spec.nf, spec.Np), jnp.float32)]
    for _s, (_start, cin, _off, rows_s) in enumerate(_src_slices(spec.nf, spec.gc)):
        args.append(jax.ShapeDtypeStruct((3, 3, rows_s, 3 * cin), nd))
    args.append(jax.ShapeDtypeStruct((3, 1, spec.rows), jnp.float32))
    import logging

    log = logging.getLogger("base")
    try:
        jax.jit(_build_call(spec, 1, False)).lower(*args).compile()
        _PROBE_CACHE[spec] = True
        return True
    except Exception as e:  # noqa: BLE001 — classify below; fall back either way
        msg = str(e).lower()
        if "vmem" in msg or "scoped" in msg:
            _PROBE_CACHE[spec] = False  # definitive: the shape does not fit
            log.warning(
                f"fused RRDB kernel exceeds the scoped-VMEM limit at "
                f"{spec.H}x{spec.W} (nf={spec.nf}, gc={spec.gc}); using the "
                "XLA trunk for this shape"
            )
        else:
            log.warning(
                f"fused-RRDB compile probe failed at {spec.H}x{spec.W} with a "
                f"non-VMEM error ({type(e).__name__}); using the XLA trunk for "
                "this trace (will re-probe on the next one)"
            )
        return False


def rrdb_apply(spec: RDBSpec, packed: dict, x_cn: jnp.ndarray,
               interpret: Optional[bool] = None) -> jnp.ndarray:
    """One fused RRDB on channel-major input (B, nf, Np) f32 (lane-padded)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x_cn.shape[0]
    args = [x_cn] + [packed[k] for k in _PACK_KEYS]
    return _build_call(spec, B, interpret)(*args)


def pack_rrdb_trunk(spec: RDBSpec, trunk_stacked: dict):
    """Pack an init_rrdb_trunk stack (leading nb axis) into kernel params.

    Per-RRDB list by default; in resident-trunk mode (HCFLOW_RDB_TRUNK=1) the
    per-RRDB packs are concatenated over the RDB axis into one stacked dict
    (leading dim nb*3) consumed by the whole-trunk kernel's streamed BlockSpecs.
    """
    nb = jax.tree.leaves(trunk_stacked)[0].shape[0]
    packs = [
        pack_rrdb(spec, jax.tree.map(lambda a: a[i], trunk_stacked))
        for i in range(nb)
    ]
    if _TRUNK:
        return {k: jnp.concatenate([p[k] for p in packs], axis=0) for k in _PACK_KEYS}
    return packs


def trunk_apply(spec: RDBSpec, packed, x_nhwc: jnp.ndarray,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused RRDB trunk on NHWC input: one layout transpose in, one out.

    ``packed`` is either the per-RRDB list (one pallas_call per RRDB, x
    round-trips HBM between calls) or the resident-trunk stacked dict (one
    pallas_call for the whole trunk, carries never leave VMEM).  The stacked
    form falls back to per-RRDB slices if the trunk kernel fails its AOT
    compile probe on this shape.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x_nhwc.shape
    in_dtype = x_nhwc.dtype
    x = jnp.transpose(x_nhwc.astype(jnp.float32), (0, 3, 1, 2)).reshape(
        B, C, H * W
    )
    if spec.Np != spec.N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, spec.Np - spec.N)))
    if isinstance(packed, dict):  # resident-trunk mode
        nbl = packed["b"].shape[0] // 3
        if interpret or trunk_kernel_compiles(spec, nbl):
            args = [x] + [packed[k] for k in _PACK_KEYS]
            x = _build_call_trunk(spec, B, nbl, interpret)(*args)
            x = x[:, :, : spec.N]
            return jnp.transpose(x.reshape(B, C, H, W), (0, 2, 3, 1)).astype(in_dtype)
        # probe failed: slice the stacked pack back into per-RRDB calls
        packed = [
            {k: packed[k][3 * i : 3 * (i + 1)] for k in _PACK_KEYS}
            for i in range(nbl)
        ]
    for p in packed:
        x = rrdb_apply(spec, p, x, interpret)
    x = x[:, :, : spec.N]
    return jnp.transpose(x.reshape(B, C, H, W), (0, 2, 3, 1)).astype(in_dtype)
