"""Benchmark: x4 SR inverse-pass (LR -> HR sampling) throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: HR megapixels/second for the full reverse flow of the flagship x4 DF2K
topology (K=26, L=2, RRDB_nb=(7,7), nf=64 — train_SR_DF2K_4X_HCFlow.yml shape) in the
serving configuration: bf16 coupling/encoder nets (f32 accumulate; invertible
arithmetic f32), hoisted cond convs, precomputed invconv inverses, and BOTH fused
Pallas serving kernels — the inverse flow-step chains (ops/pallas_chain.py) and the
RRDB encoder trunks (ops/pallas_rdb.py).  Batch 16, 40x40 LR -> 160x160 HR.

Timing = an in-graph lax.fori_loop of 10 reverse passes, RNG key folded per
iteration (cache-proof), with the FULL fused path (fused="all") — safe in loop
contexts since the round-3 scoped-VMEM root-cause fix (ops/pallas_rdb.py
docstring), and free of the ~28 ms/call host dispatch overhead, so it measures
pure device throughput (the sustained-serving number).  Fallback cascade if this
path errors for any reason: dispatch-median with fused="all" (~6 MP/s incl. host
overhead), then the chains-only fori loop (the round-2 methodology, ~4.6 MP/s),
then a pure-XLA fori loop with no Pallas anywhere (fused=False, ~1.6 MP/s — the
last resort if the chain kernel itself is what broke).  The "method" field
records which path produced the number.  Even a total failure of all four stages
emits ONE JSON line with "value": null and an "error" field carrying the full
per-stage fallback chain — a driver run can never produce an empty artifact
short of a backend hang (bounded separately by the backend_ready probe).

vs_baseline is the ratio to BASELINE_MPS — a derived A100 estimate for the PyTorch
reference on this exact workload (the reference publishes no perf numbers): 7.20
TFLOP per HR megapixel (torch-profiler-measured) divided by a deliberately generous
20 TFLOP/s effective A100 throughput. Methodology, measured CPU datapoint, and the
1.4-4.2 MP/s defensible range: BASELINE.md "Measured + derived throughput baseline".
"""

import json
import os
import statistics
import sys
import time

import jax
from jax import lax

sys.path.insert(0, "/root/repo")

from hcflow_tpu.models import HCFlowSRSpec  # noqa: E402

BASELINE_MPS = 2.78  # derived A100 estimate for the torch reference (BASELINE.md)

BATCH = 16
LR_HW = 40
SCALE = 4
ITERS = 10


def _backend_ready(deadline_s=300.0):
    """Bounded TPU-backend readiness probe (utils/backend_guard.py): daemon-
    thread first-device-op with a wall-clock deadline + bounded retries, so a
    wedged tunnel produces a fast machine-readable JSON line instead of a hang
    or rc=1 stack trace (BENCH_r03.json failure mode)."""
    from hcflow_tpu.utils.backend_guard import backend_ready

    ok, reason = backend_ready(deadline_s=deadline_s)
    return ok, ("" if ok else f"tpu-unavailable: {reason}")


def _model(compute_dtype, fused):
    model = HCFlowSRSpec.for_scale(SCALE, compute_dtype=compute_dtype)
    params = model.flow.precompute_inference(
        model.init(jax.random.PRNGKey(0)), fused=fused
    )
    return model, params


def measure_dispatch(compute_dtype, lr):
    """Median per-dispatch time, fresh key per call (trunks+chains fused)."""
    model, params = _model(compute_dtype, "all")
    rev = jax.jit(lambda p, k, x: model.reverse(p, k, x, 0.9))
    times = []
    for i in range(12):
        key = jax.random.PRNGKey(1000 + i)
        t0 = time.perf_counter()
        out = rev(params, key, lr)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times[2:])
    return BATCH * (LR_HW * SCALE) ** 2 / 1e6 / dt


def measure_fori(compute_dtype, lr, key, scale=SCALE, lr_hw=LR_HW, fused=True):
    """Fused path (chains, or chains+trunks with fused="all") timed in-graph."""
    model, params = _model(compute_dtype, fused)

    @jax.jit
    def run(lr, base):
        def body(i, x):
            out = model.reverse(params, jax.random.fold_in(key, base + i), x, 0.9)
            return x + out[:, ::scale, ::scale, :] * 1e-6
        return lax.fori_loop(0, ITERS, body, lr)

    # warmup and timed calls take different arguments (fold base) so the timed
    # call cannot be served from the runtime's same-input result cache
    out = run(lr, 0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(lr, ITERS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH * (lr_hw * scale) ** 2 / 1e6 / dt


def main():
    ready, reason = _backend_ready()
    if not ready:
        # fast, machine-readable failure instead of rc=1 + stack trace
        print(json.dumps({
            "metric": "x4_sr_inverse_throughput", "value": None,
            "unit": "MP/s/chip", "vs_baseline": None, "error": reason,
        }))
        print(f"bench aborted: {reason}", file=sys.stderr)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)
    fallback_log = []  # shared with _measure_cascade so a total failure keeps the chain
    try:
        _measure_cascade(lr, key, fallback_log)
    except Exception as e:  # noqa: BLE001 — even a total failure emits ONE JSON line
        chain = " | ".join(fallback_log)
        print(json.dumps({
            "metric": "x4_sr_inverse_throughput", "value": None,
            "unit": "MP/s/chip", "vs_baseline": None,
            "error": (f"all paths failed: {type(e).__name__}: {str(e)[:300]}"
                      + (f" | earlier stages: {chain}" if chain else "")),
        }))
        print(f"bench failed on every path: {e}", file=sys.stderr)
        sys.stdout.flush()
        os._exit(0)


def _measure_cascade(lr, key, fallback_log=None):
    fallback_log = [] if fallback_log is None else fallback_log
    fallback_reason = None
    try:
        mps = measure_fori("bfloat16", lr, key, fused="all")
        method = "fori-all"
    except Exception as e:  # noqa: BLE001 — fall back to dispatch, then chains-only
        fallback_log.append(f"fori-all failed: {type(e).__name__}: {str(e)[:300]}")
        print(fallback_log[-1] + "; dispatch fallback", file=sys.stderr)
        try:
            mps = measure_dispatch("bfloat16", lr)
            method = "dispatch-median-all"
        except Exception as e2:  # noqa: BLE001
            fallback_log.append(
                f"dispatch failed: {type(e2).__name__}: {str(e2)[:300]}"
            )
            print(f"dispatch failed ({type(e2).__name__}); chains-only fori",
                  file=sys.stderr)
            try:
                mps = measure_fori("bfloat16", lr, key)
                method = "fori-chains-only"
            except Exception as e3:  # noqa: BLE001 — last resort: no Pallas at all
                # All three fused paths share the chain kernel; if THAT is what
                # broke (e.g. a Mosaic regression), fall back to the pure-XLA
                # serving path so the bench still emits a real number (measured
                # in this cascade's position: ~1.6 MP/s, the round-1 figure).
                fallback_log.append(
                    f"chains-only failed: {type(e3).__name__}: {str(e3)[:300]}"
                )
                print(f"chains-only failed ({type(e3).__name__}); pure-XLA fori",
                      file=sys.stderr)
                mps = measure_fori("bfloat16", lr, key, fused=False)
                method = "fori-xla"
        fallback_reason = " | ".join(fallback_log)
    out = {
        "metric": "x4_sr_inverse_throughput",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": (round(mps / BASELINE_MPS, 3) if BASELINE_MPS else None),
        "method": method,
    }
    if fallback_reason:
        out["fallback_reason"] = fallback_reason
    print(json.dumps(out))
    if "--all" in sys.argv:
        print(f"dispatch-median all: {measure_dispatch('bfloat16', lr):.3f} MP/s",
              file=sys.stderr)
        print(f"chains-only fori: {measure_fori('bfloat16', lr, key):.3f} MP/s",
              file=sys.stderr)
        print(f"f32 fori: {measure_fori(None, lr, key):.3f} MP/s", file=sys.stderr)


if __name__ == "__main__":
    main()
