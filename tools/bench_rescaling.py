"""Benchmark: x4 RESCALING inverse-pass (LR -> HR reconstruction) throughput, one chip.

The third pillar's serving number (VERDICT r4 #3): the rescaling reverse
(ref:codes/models/modules/FlowNet_Rescaling_x4.py:109-129) at the shipped
topology (train_Rescaling_DF2K_4X_HCFlow.yml: K=14, L=2, haar squeeze, no
permutation, Affine3shift/DenseBlock h=32 main chains, split-off Affine/FCN
K=6 + RRDB encoders nb=(2,1) nf64 gc16), batch 16, 40x40 LR -> 160x160 HR,
heat 1.0 (the reference's rescaling temperature).

Methodology mirrors bench.py: in-graph lax.fori_loop of 10 reverse passes, RNG
key folded per iteration (immune to dispatch latency and the axon runtime's
same-input result cache).  Segment scoping (tools/scope_rescaling_kernel.py):
encoders 48% + split-off chains 14% of reverse FLOPs are fused-kernel eligible
(the SAME pallas_rdb / pallas_chain kernels as SR serving); the MAIN
Affine3shift/DenseBlock chains (37%) run XLA-only.  Measures the fused="all"
path with a pure-XLA fallback and prints ONE JSON line.
"""

import json
import statistics
import sys
import time

import jax
from jax import lax

sys.path.insert(0, "/root/repo")

from hcflow_tpu.models import HCFlowRescalingSpec  # noqa: E402

BATCH = 16
LR_HW = 40
SCALE = 4
ITERS = 10


def _model(fused):
    model = HCFlowRescalingSpec.default_x4(compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    params = model.flow.precompute_inference(params, fused=fused)
    return model, params


def measure_fori(fused):
    model, params = _model(fused)
    key = jax.random.PRNGKey(2)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))

    @jax.jit
    def run(lr, base):
        def body(i, x):
            out = model.reverse(params, jax.random.fold_in(key, base + i), x, 1.0)
            return x + out[:, ::SCALE, ::SCALE, :] * 1e-6

        return lax.fori_loop(0, ITERS, body, lr)

    out = run(lr, 0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(lr, ITERS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH * (LR_HW * SCALE) ** 2 / 1e6 / dt


def main():
    from hcflow_tpu.utils.backend_guard import backend_ready

    ok, reason = backend_ready(deadline_s=300.0)
    if not ok:
        print(json.dumps({
            "metric": "x4_rescaling_inverse_throughput", "value": None,
            "unit": "MP/s/chip", "error": f"tpu-unavailable: {reason}",
        }))
        return
    fallback = None
    try:
        mps = measure_fori("all")
        method = "fori-all"
    except Exception as e:  # noqa: BLE001
        fallback = f"fori-all failed: {type(e).__name__}: {str(e)[:300]}"
        print(fallback, file=sys.stderr)
        mps = measure_fori(False)
        method = "fori-xla"
    out = {
        "metric": "x4_rescaling_inverse_throughput",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "method": method,
    }
    if fallback:
        out["fallback_reason"] = fallback
    print(json.dumps(out))


if __name__ == "__main__":
    main()
