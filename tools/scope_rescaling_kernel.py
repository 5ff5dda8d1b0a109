"""Go/no-go scoping for a fused rescaling-family serving kernel.

Question (NOTES.md round-4 roadmap #2 / round-3 verdict #7): the rescaling
reverse's MAIN chains are Affine3shift + DenseBlock with no permutation — not
eligible for the existing fused chain kernel (ops/pallas_chain.py).  Is a new
fused kernel worth writing?  The win is bounded by how much of the reverse is
main-step chains vs encoders vs the (already-fusable) split-off Affine/FCN
chains.

Method: XLA cost analysis (FLOPs + bytes accessed) of each segment of
FlowNetSpec.reverse_flow at the shipped rescaling topology
(train_Rescaling_DF2K_4X_HCFlow.yml: K=14, L=2, haar, DenseBlock h=32,
split-off RRDB_nb (2,1) nf64 gc16 + FCN h64), serving shape batch 16,
40x40 LR -> 160x160 HR.  Runs on CPU — cost analysis is backend-independent
for FLOP counting purposes.

Usage: python tools/scope_rescaling_kernel.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hcflow_tpu.models import HCFlowRescalingSpec  # noqa: E402

BATCH = 16
LR_HW = 40


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    model = HCFlowRescalingSpec.default_x4()
    flow = model.flow
    params = model.init(jax.random.PRNGKey(0))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)

    full_f, full_b = cost(lambda p, k, x: model.reverse(p, k, x, 1.0), params, key, lr)

    # capture real segment inputs with one eager reverse
    z = lr
    cond_feats = [None] * flow.L
    keys = jax.random.split(key, flow.L)
    segs = []
    for i in reversed(range(flow.L)):
        lv = flow.levels[i]
        cp = params[f"level{i}"]["cond"]
        u = flow._cond_input(i, z, cond_feats)

        ef, eb = cost(lambda p, x, lv=lv: lv.cond_spec.cond_feature(p, x), cp, u)
        segs.append((f"L{i} encoder (cond_feature)", ef, eb))

        a, cond_feats[i] = lv.cond_spec.reverse(cp, keys[i], u, 1.0)
        cond_c = cond_feats[i]
        if lv.cond_spec.n_flow_step > 0:
            def so_steps(p, x, c, lv=lv):
                zeros = jnp.zeros((x.shape[0],), x.dtype)
                out, _ = lv.cond_spec._run_steps(p, x, c, zeros, inverse=True)
                return out
            sf, sb = cost(so_steps, cp, a, cond_c)
            # subtract nothing: _run_steps with explicit cond does not re-run
            # the encoder
            segs.append((f"L{i} split-off Affine/FCN chain (K={lv.cond_spec.n_flow_step})", sf, sb))

        z_cat = jnp.concatenate([z, a], axis=-1)

        def main_inv(p, x, lv=lv, i=i):
            zeros = jnp.zeros((x.shape[0],), x.dtype)
            out, _ = flow._main_inverse(lv, p, x, zeros)
            return out
        mf, mb = cost(main_inv, params[f"level{i}"], z_cat)
        segs.append((f"L{i} MAIN Affine3shift/DenseBlock chain (K={lv.n_main})", mf, mb))

        zeros = jnp.zeros((z_cat.shape[0],), z_cat.dtype)
        z, _ = flow._main_inverse(lv, params[f"level{i}"], z_cat, zeros)
        z = flow._unsqueeze(z)

    print(f"{'segment':55s} {'GFLOP':>8s} {'GB':>7s} {'%FLOP':>6s}")
    main_f = so_f = enc_f = 0.0
    for name, f, b in segs:
        print(f"{name:55s} {f / 1e9:8.2f} {b / 1e9:7.2f} {100 * f / full_f:6.1f}")
        if "MAIN" in name:
            main_f += f
        elif "split-off" in name:
            so_f += f
        else:
            enc_f += f
    print(f"{'full reverse':55s} {full_f / 1e9:8.2f} {full_b / 1e9:7.2f} {'100.0':>6s}")
    other = full_f - main_f - so_f - enc_f
    print(
        f"\nshares of full-reverse FLOPs: MAIN chains {100 * main_f / full_f:.1f}%, "
        f"split-off chains {100 * so_f / full_f:.1f}%, encoders {100 * enc_f / full_f:.1f}%, "
        f"glue/other {100 * other / full_f:.1f}%"
    )
    print(
        "\ngo/no-go guide: a fused MAIN-chain kernel is worth writing only if the "
        "MAIN share dominates AND the XLA schedule is memory-bound there "
        "(bytes/FLOP high). Record the verdict in docs/kernels.md."
    )


if __name__ == "__main__":
    main()
