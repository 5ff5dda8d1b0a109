"""Benchmark: x4 SR inverse-pass (LR -> HR sampling) throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: HR megapixels/second for the full reverse flow of the flagship x4 DF2K
topology (K=26, L=2, RRDB_nb=(7,7), nf=64 — train_SR_DF2K_4X_HCFlow.yml shape) in the
serving configuration: bf16 coupling/encoder nets (f32 accumulate, invertible
arithmetic f32) + precomputed invconv inverses.  Batch 8, 40x40 LR -> 160x160 HR.
vs_baseline is the ratio to BASELINE_MPS (A100 reference estimate; null until known —
the reference repo publishes no perf numbers).

Run with --all to additionally print f32-path and forward-pass numbers (stderr).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from hcflow_tpu.models import HCFlowSRSpec  # noqa: E402

BASELINE_MPS = None  # A100 reference MP/s (unknown: repo publishes no perf numbers)

BATCH = 8
LR_HW = 40
SCALE = 4


def _timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure(compute_dtype, precompute, lr, key):
    model = HCFlowSRSpec.for_scale(SCALE, compute_dtype=compute_dtype)
    params = model.init(jax.random.PRNGKey(0))
    if precompute:
        params = model.flow.precompute_inference(params)
    reverse = jax.jit(lambda p, k, x: model.reverse(p, k, x, 0.9))
    dt = _timeit(reverse, params, key, lr)
    hr_mp = BATCH * (LR_HW * SCALE) ** 2 / 1e6
    return hr_mp / dt


def main():
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)

    mps_fast = measure("bfloat16", True, lr, key)
    print(
        json.dumps(
            {
                "metric": "x4_sr_inverse_throughput",
                "value": round(mps_fast, 3),
                "unit": "MP/s/chip",
                "vs_baseline": (round(mps_fast / BASELINE_MPS, 3) if BASELINE_MPS else None),
            }
        )
    )
    if "--all" in sys.argv:
        mps_f32 = measure(None, True, lr, key)
        print(f"f32 path: {mps_f32:.3f} MP/s", file=sys.stderr)


if __name__ == "__main__":
    main()
