"""Benchmark: x4 SR inverse-pass (LR -> HR sampling) throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: HR megapixels/second for the full reverse flow of the flagship x4 DF2K
topology (K=26, L=2, RRDB_nb=(7,7), nf=64 — train_SR_DF2K_4X_HCFlow.yml shape) in the
serving configuration: bf16 coupling/encoder nets (f32 accumulate; invertible
arithmetic f32), scatter-form dense blocks, hoisted cond convs, precomputed invconv
inverses, and the fused Pallas inverse-chain kernel (ops/pallas_chain.py) for all
four flow-step chains.  Batch 16, 40x40 LR -> 160x160 HR.

Timing uses an in-graph fori_loop (per-iteration key folding) so the result is not
polluted by per-call dispatch or the runtime's same-input result caching, and the
timed call's arguments differ from the warmup call's (different fold base) so the
two calls can never hit a same-input result cache.

vs_baseline is the ratio to BASELINE_MPS — a derived A100 estimate for the PyTorch
reference on this exact workload (the reference publishes no perf numbers): 7.20
TFLOP per HR megapixel (torch-profiler-measured) divided by a deliberately generous
20 TFLOP/s effective A100 throughput. Methodology, measured CPU datapoint, and the
1.4-4.2 MP/s defensible range: BASELINE.md "Measured + derived throughput baseline".
"""

import json
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


def measure(compute_dtype, lr, key):
    model = HCFlowSRSpec.for_scale(SCALE, compute_dtype=compute_dtype)
    params = model.flow.precompute_inference(
        model.init(jax.random.PRNGKey(0)), fused=True
    )

    @jax.jit
    def run(lr, base):
        def body(i, x):
            out = model.reverse(params, jax.random.fold_in(key, base + i), x, 0.9)
            return x + out[:, ::SCALE, ::SCALE, :] * 1e-6
        return lax.fori_loop(0, ITERS, body, lr)

    # warmup and timed calls take different arguments (fold base) so the timed
    # call cannot be served from the runtime's same-input result cache
    out = run(lr, 0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(lr, ITERS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH * (LR_HW * SCALE) ** 2 / 1e6 / dt


def main():
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)
    mps = measure("bfloat16", lr, key)
    print(
        json.dumps(
            {
                "metric": "x4_sr_inverse_throughput",
                "value": round(mps, 3),
                "unit": "MP/s/chip",
                "vs_baseline": (round(mps / BASELINE_MPS, 3) if BASELINE_MPS else None),
            }
        )
    )
    if "--all" in sys.argv:
        print(f"f32 path: {measure(None, lr, key):.3f} MP/s", file=sys.stderr)
        # x8 face topology (CelebA config shape): 20x20 LR -> 160x160 HR
        from hcflow_tpu.models import HCFlowSRSpec as _S

        model8 = _S.for_scale(8, compute_dtype="bfloat16")
        p8 = model8.flow.precompute_inference(
            model8.init(jax.random.PRNGKey(0)), fused=True
        )
        lr8 = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 20, 20, 3))

        @jax.jit
        def run8(x, base):
            def body(i, x):
                out = model8.reverse(p8, jax.random.fold_in(key, base + i), x, 0.8)
                return x + out[:, ::8, ::8, :] * 1e-6
            return lax.fori_loop(0, ITERS, body, x)

        out = run8(lr8, 0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run8(lr8, ITERS)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"x8 face path: {BATCH * 160 * 160 / 1e6 / dt:.3f} MP/s", file=sys.stderr)


if __name__ == "__main__":
    main()
