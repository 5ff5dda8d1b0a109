"""Roofline analysis for the flagship x4 SR serving reverse (VERDICT r3 #4).

Question: the measured sustained serving rate is 39.3 ms/iter (10.47 MP/s/chip,
BENCH round 3/4).  Is the remaining time reducible, or is 10.5 MP/s near this
model's speed-of-light on one v5e chip?

Method: XLA cost analysis (FLOPs + bytes accessed) of every segment of the
serving reverse at the exact bench workload (batch 16, 40x40 LR -> 160x160 HR,
bf16 compute_dtype — the serving recipe of bench.py), on the *unfused* XLA
path: the Pallas kernels compute the same algorithm, so algorithm-level FLOPs
are identical, and cost analysis is backend-independent for counting.  Each
segment then gets a speed-of-light (SoL) time:

    SoL = max(flops / MXU_peak, bytes / HBM_BW)

with v5e peaks MXU_bf16 = 197 TFLOP/s and HBM = 819 GB/s (public chip specs;
the couplings' invertible arithmetic runs f32 but is elementwise/VPU work that
overlaps the MXU, and the only f32 *matmuls* are the 1x1 invconv C x C
applications, <1%% of FLOPs).  Bytes from XLA cost analysis understate achieved
HBM traffic (they ignore intermediate materialization XLA may spill), so the
bandwidth leg is a lower bound — which only strengthens an "irreducible"
verdict.

Output: per-segment GFLOP / GB / SoL-ms table + the total SoL vs the measured
39.3 ms, i.e. the maximum remaining headroom any further kernel work could
unlock.  Pair with tools/profile_reverse.py (measured per-segment times on the
real chip) to decide where the gap actually lives.

Runs on CPU: python tools/roofline_reverse.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hcflow_tpu.models import HCFlowSRSpec  # noqa: E402

BATCH = 16
LR_HW = 40
SCALE = 4
HEAT = 0.9

MXU_BF16 = 197e12  # v5e peak bf16 FLOP/s
HBM_BW = 819e9     # v5e HBM bytes/s


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def sol_ms(f, b):
    return max(f / MXU_BF16, b / HBM_BW) * 1e3


def main():
    model = HCFlowSRSpec.for_scale(SCALE, compute_dtype="bfloat16")
    flow = model.flow
    params = model.init(jax.random.PRNGKey(0))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)

    full_f, full_b = cost(lambda p, k, x: model.reverse(p, k, x, HEAT), params, key, lr)

    # walk the reverse eagerly to capture real segment inputs
    z = lr
    cond_feats = [None] * flow.L
    keys = jax.random.split(key, flow.L)
    segs = []
    for i in reversed(range(flow.L)):
        lv = flow.levels[i]
        cp = params[f"level{i}"]["cond"]
        u = flow._cond_input(i, z, cond_feats)

        ef, eb = cost(lambda p, x, lv=lv: lv.cond_spec.cond_feature(p, x), cp, u)
        segs.append((f"L{i} encoder (conv_first+RRDB trunks+conv1)", ef, eb))

        a, cond_feats[i] = lv.cond_spec.reverse(cp, keys[i], u, HEAT)
        cond_c = cond_feats[i]
        if lv.cond_spec.n_flow_step > 0:
            def so_steps(p, x, c, lv=lv):
                zeros = jnp.zeros((x.shape[0],), x.dtype)
                out, _ = lv.cond_spec._run_steps(p, x, c, zeros, inverse=True)
                return out
            sf, sb = cost(so_steps, cp, a, cond_c)
            segs.append((f"L{i} split-off chain (K={lv.cond_spec.n_flow_step})", sf, sb))

        z_cat = jnp.concatenate([z, a], axis=-1)

        def main_inv(p, x, lv=lv):
            zeros = jnp.zeros((x.shape[0],), x.dtype)
            out, _ = flow._main_inverse(lv, p, x, zeros)
            return out
        mf, mb = cost(main_inv, params[f"level{i}"], z_cat)
        segs.append((f"L{i} MAIN chain (K={lv.n_main})", mf, mb))

        zeros = jnp.zeros((z_cat.shape[0],), z_cat.dtype)
        z, _ = flow._main_inverse(lv, params[f"level{i}"], z_cat, zeros)
        z = flow._unsqueeze(z)

    print(f"{'segment':48s} {'GFLOP':>8s} {'GB':>7s} {'SoL ms':>7s} {'bound':>6s}")
    tot_f = tot_b = tot_sol = 0.0
    for name, f, b in segs:
        s = sol_ms(f, b)
        bound = "MXU" if f / MXU_BF16 >= b / HBM_BW else "HBM"
        tot_f += f
        tot_b += b
        tot_sol += s
        print(f"{name:48s} {f / 1e9:8.2f} {b / 1e9:7.3f} {s:7.3f} {bound:>6s}")
    glue_f, glue_b = full_f - tot_f, max(full_b - tot_b, 0.0)
    gs = sol_ms(glue_f, glue_b)
    print(f"{'glue/other (residual)':48s} {glue_f / 1e9:8.2f} {glue_b / 1e9:7.3f} {gs:7.3f}")
    print(f"{'FULL REVERSE':48s} {full_f / 1e9:8.2f} {full_b / 1e9:7.3f}")

    mp = BATCH * (LR_HW * SCALE) ** 2 / 1e6
    sol_total = sol_ms(full_f, full_b)
    print(f"\nworkload: {mp:.3f} HR MP/iter")
    print(f"speed-of-light (perfect overlap, one fused dispatch): "
          f"{sol_total:.2f} ms  =>  {mp / sol_total * 1e3:.1f} MP/s")
    print(f"speed-of-light (per-segment serial):                  "
          f"{tot_sol + gs:.2f} ms  =>  {mp / (tot_sol + gs) * 1e3:.1f} MP/s")
    print("compare: measured sustained 39.3 ms => 10.47 MP/s (BENCH r3/r4)")
    print("=> headroom factor vs serial SoL: "
          f"{39.3 / (tot_sol + gs):.2f}x")


if __name__ == "__main__":
    main()
