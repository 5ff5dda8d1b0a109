"""Benchmark: x4 SR inverse-pass (LR -> HR sampling) throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is HR megapixels produced per second by the full reverse flow of the
flagship x4 DF2K topology (K=26, L=2, RRDB_nb=(7,7), nf=64 — the shipped
train_SR_DF2K_4X_HCFlow.yml shape), batch 8, 40x40 LR -> 160x160 HR, float32.
vs_baseline is the ratio to BASELINE_MPS (the A100 reference estimate recorded in
BASELINE.md once measured; null until then).
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


def main():
    model = HCFlowSRSpec.for_scale(SCALE)  # DF2K x4: K=26, L=2, rrdb_nb=(7,7)
    params = model.init(jax.random.PRNGKey(0))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))

    reverse = jax.jit(lambda p, k, x: model.reverse(p, k, x, 0.9))
    key = jax.random.PRNGKey(2)

    # warmup / compile
    out = reverse(params, key, lr)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = reverse(params, jax.random.fold_in(key, i), lr)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    hr_mp = BATCH * (LR_HW * SCALE) ** 2 / 1e6
    mps = hr_mp * n_iters / dt
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


if __name__ == "__main__":
    main()
