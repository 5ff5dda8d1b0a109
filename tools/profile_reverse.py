"""Segment-level profile of the flagship x4 serving reverse pass.

Times each component of FlowNetSpec.reverse_flow separately at the bench shape
(batch 16, 40x40 LR -> 160x160 HR, bf16 serving config, fused="all"):

  - full reverse                      (the bench.py headline path)
  - per-level cond_feature            (conv_first + RRDB trunks + trunk_conv1)
  - per-level fused trunk alone       (pallas_rdb.trunk_apply)
  - per-level prior + sampling        (conv-zeros head + gaussian_sample)
  - per-level fused step chain        (pallas_chain.inverse_chain)
  - per-level main inverse chain

Each segment is timed with the bench methodology: an in-graph lax.fori_loop of
ITERS calls with a folded key / perturbed input per iteration (cache-proof,
no host dispatch overhead).  Prints a table plus the implied glue residual
(full - sum of parts), which is the target for further fusion work
(NOTES.md round-4 roadmap #3).

Run on the real chip: python tools/profile_reverse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from hcflow_tpu.models import HCFlowSRSpec  # noqa: E402

BATCH = 16
LR_HW = 40
SCALE = 4
ITERS = 10


def timed_fori(fn, x, key):
    """Per-iteration seconds of fn(x, k) via an in-graph fori loop; fn must
    return something shaped like a scalar-reducible array."""

    @jax.jit
    def run(x, base):
        def body(i, acc):
            out = fn(x, jax.random.fold_in(key, base + i))
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    out = run(x, 0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x, ITERS)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from hcflow_tpu.utils.backend_guard import backend_ready

    ok, reason = backend_ready(deadline_s=240.0)
    if not ok:
        print(f"backend unavailable: {reason}")
        os._exit(1)

    model = HCFlowSRSpec.for_scale(SCALE, compute_dtype="bfloat16")
    flow = model.flow
    params = flow.precompute_inference(model.init(jax.random.PRNGKey(0)), fused="all")
    lr = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LR_HW, LR_HW, 3))
    key = jax.random.PRNGKey(2)

    # ---- capture real intermediates (one eager reverse, recording segment inputs)
    z = lr
    cond_feats = [None] * flow.L
    inter = {}  # level -> dict(u, z_pre_main, lvl)
    keys = jax.random.split(key, flow.L)
    for i in reversed(range(flow.L)):
        lv = flow.levels[i]
        u = flow._cond_input(i, z, cond_feats)
        a, cond_feats[i] = lv.cond_spec.reverse(params[f"level{i}"]["cond"], keys[i], u, 0.9)
        z_cat = jnp.concatenate([z, a], axis=-1)
        inter[i] = {"u": u, "z_cat": z_cat, "lv": lv}
        zeros = jnp.zeros((z_cat.shape[0],), z_cat.dtype)
        z, _ = flow._main_inverse(lv, params[f"level{i}"], z_cat, zeros)
        z = flow._unsqueeze(z)
    jax.block_until_ready(z)

    rows = []

    # full reverse
    dt = timed_fori(lambda x, k: model.reverse(params, k, x, 0.9), lr, key)
    full = dt
    rows.append(("full reverse", dt))

    for i in reversed(range(flow.L)):
        lv, u, z_cat = inter[i]["lv"], inter[i]["u"], inter[i]["z_cat"]
        cp = params[f"level{i}"]["cond"]

        dt = timed_fori(lambda x, k, cp=cp, lv=lv: lv.cond_spec.cond_feature(cp, x), u, key)
        rows.append((f"L{i} cond_feature (encoder)", dt))

        fused0 = cp.get("trunk0_fused")
        if fused0 is not None:
            from hcflow_tpu.ops import pallas_rdb

            cd = lv.cond_spec.encoder_dtype or lv.cond_spec.compute_dtype
            nf = lv.cond_spec.rrdb_nf
            x0 = jnp.zeros((BATCH, u.shape[1], u.shape[2], nf), jnp.float32)
            spec = pallas_rdb.RDBSpec(
                nf=nf, gc=lv.cond_spec.rrdb_gc, H=u.shape[1], W=u.shape[2],
                compute_dtype=cd,
            )
            dt = timed_fori(
                lambda x, k, spec=spec, fused0=fused0:
                    pallas_rdb.trunk_apply(spec, fused0, x + jax.random.uniform(k, (), x.dtype) * 0),
                x0, key,
            )
            rows.append((f"L{i} trunk0 fused alone", dt))

        def prior_sample(x, k, cp=cp, lv=lv):
            cond = lv.cond_spec.cond_feature(cp, x)
            mean, logs = lv.cond_spec._prior(cp, cond)
            from hcflow_tpu.ops import densities
            return densities.gaussian_sample(k, mean, logs, 0.9)
        dt_ps = timed_fori(prior_sample, u, key)
        rows.append((f"L{i} encoder+prior+sample", dt_ps))

        if lv.cond_spec.n_flow_step > 0:
            cond_c = jax.block_until_ready(lv.cond_spec.cond_feature(cp, u))

            def cond_steps(x, k, cp=cp, lv=lv, cond_c=cond_c):
                zeros = jnp.zeros((x.shape[0],), x.dtype)
                out, _ = lv.cond_spec._run_steps(
                    cp, x + jax.random.uniform(k, (), x.dtype) * 0,
                    cond_c, zeros, inverse=True)
                return out

            a0 = jnp.zeros(z_cat.shape[:-1] + (lv.cond_spec.a_channels,), jnp.float32)
            dt = timed_fori(cond_steps, a0, key)
            rows.append((f"L{i} cond step chain", dt))

        def main_inv(x, k, lv=lv, i=i):
            zeros = jnp.zeros((x.shape[0],), x.dtype)
            out, _ = flow._main_inverse(lv, params[f"level{i}"],
                                        x + jax.random.uniform(k, (), x.dtype) * 0, zeros)
            return out
        dt = timed_fori(main_inv, z_cat, key)
        rows.append((f"L{i} main inverse chain", dt))

    parts = sum(
        dt for name, dt in rows
        if ("cond_feature" in name or "step chain" in name or "main inverse" in name)
    )
    print(f"\n{'segment':35s} {'ms/iter':>9s}")
    for name, dt in rows:
        print(f"{name:35s} {dt * 1e3:9.2f}")
    print(f"{'sum(encoder+main) parts':35s} {parts * 1e3:9.2f}")
    print(f"{'glue residual (full - parts)':35s} {(full - parts) * 1e3:9.2f}")
    mps = BATCH * (LR_HW * SCALE) ** 2 / 1e6 / full
    print(f"\nfull reverse: {full * 1e3:.2f} ms/iter = {mps:.2f} MP/s/chip")


if __name__ == "__main__":
    main()
