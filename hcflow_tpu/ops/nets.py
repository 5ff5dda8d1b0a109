"""Non-invertible sub-networks used inside couplings and conditional encoders.

Behavioral reference: /root/reference/codes/models/modules/Basic.py:14-72 (actnorm-
normalized Conv2d, zero-init Conv2dZeros), Basic.py:329-447 (DenseBlock, FCN,
ResidualDenseBlock, RRDB) and module_util.py:7-43 (init schemes).

Everything here is a pure ``apply(params, x)`` on NHWC tensors; convolutions use
HWIO weights and lax.conv_general_dilated so XLA tiles them onto the MXU.  Coupling
nets end in a zero-initialized conv so each coupling starts as the identity.

FCN's hidden convs carry their own ActNorm (no logdet — they are not on the invertible
path) whose data-dependent init is exposed via the ``calib_*`` variants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from . import actnorm

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b=None,
    stride: int = 1,
    precision=None,
    compute_dtype=None,
) -> jnp.ndarray:
    """'same'-padded 2D conv, NHWC x HWIO.

    Two modes:
    - default (compute_dtype=None): HIGHEST precision — true f32 on the MXU.  Used on
      any path feeding invertible arithmetic, where bf16 error would hurt round-trips.
    - compute_dtype='bfloat16': run the conv fully in bf16 (~4x faster on the MXU)
      and upcast the result.  Safe for coupling NNs and conditioning encoders:
      forward and inverse evaluate the *same deterministic function*, so
      invertibility is bit-preserved; only parity vs an f32 run shifts slightly.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    if compute_dtype is not None:
        # conv fully in the compute dtype, then upcast: preferred_element_type=f32
        # with bf16 operands has no valid AD transpose (backward conv would see
        # mixed dtypes), so outputs round through bf16 — standard mixed precision.
        dt = jnp.dtype(compute_dtype)
        y = lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (stride, stride), pad, dimension_numbers=_DN
        ).astype(jnp.float32)
    else:
        if precision is None:
            precision = lax.Precision.HIGHEST
        y = lax.conv_general_dilated(
            x, w, (stride, stride), pad, dimension_numbers=_DN, precision=precision
        )
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------- inits
def _fans(shape):  # HWIO
    kh, kw, i, o = shape
    rf = kh * kw
    return i * rf, o * rf


def xavier_normal(key, shape, scale=1.0, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * (std * scale)


def kaiming_normal(key, shape, scale=1.0, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * (std * scale)


def torch_default_conv(key, shape, dtype=jnp.float32):
    """PyTorch's default Conv2d init: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, shape, dtype, -bound, bound)
    b = jax.random.uniform(kb, (shape[3],), dtype, -bound, bound)
    return w, b


# ------------------------------------------------------------------- Conv + ActNorm
def init_conv_actnorm(key, cin, cout, ksize, init="xavier", scale=0.1, dtype=jnp.float32):
    """Basic.Conv2d with do_actnorm=True (bias-free conv followed by ActNorm)."""
    shape = (ksize, ksize, cin, cout)
    if init == "xavier":
        w = xavier_normal(key, shape, scale, dtype)
    else:
        w = kaiming_normal(key, shape, scale, dtype)
    return {"w": w, "actnorm": actnorm.init(cout, dtype)}


def apply_conv_actnorm(params, x, compute_dtype=None):
    y = conv2d(x, params["w"], compute_dtype=compute_dtype)
    y, _ = actnorm.forward(params["actnorm"], y)
    return y


def calib_conv_actnorm(params, x):
    y = conv2d(x, params["w"])
    an = actnorm.calibrate(y)
    y, _ = actnorm.forward(an, y)
    return {"w": params["w"], "actnorm": an}, y


# ----------------------------------------------------------------------- Conv2dZeros
def init_conv_zeros(cin, cout, ksize=3, dtype=jnp.float32):
    return {
        "w": jnp.zeros((ksize, ksize, cin, cout), dtype),
        "b": jnp.zeros((cout,), dtype),
        "logs": jnp.zeros((cout,), dtype),
    }


def apply_conv_zeros(params, x, logscale_factor: float = 3.0):
    y = conv2d(x, params["w"], params["b"])
    return y * jnp.exp(params["logs"] * logscale_factor)


# ------------------------------------------------------------------------------ FCN
def init_fcn(key, cin, cout, hidden, kernel_hidden=1, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv_actnorm(k1, cin, hidden, 3, "xavier", 0.1, dtype),
        "conv2": init_conv_actnorm(k2, hidden, hidden, kernel_hidden, "xavier", 0.1, dtype),
        "conv3": init_conv_zeros(hidden, cout, 3, dtype),
    }


def apply_fcn(params, x, compute_dtype=None):
    x = jax.nn.relu(apply_conv_actnorm(params["conv1"], x, compute_dtype))
    x = jax.nn.relu(apply_conv_actnorm(params["conv2"], x, compute_dtype))
    return apply_conv_zeros(params["conv3"], x)


def apply_fcn_hoisted(params, z1, u_contrib, compute_dtype=None):
    """FCN where the conditioning channels' conv1 contribution is precomputed.

    conv1 is linear in its input, so conv1(cat(z1, u)) = conv1_z(z1) + conv1_u(u).
    When the same cond features u feed K sequential flow steps, all K u-contributions
    are computed as ONE wide conv outside the scan (see flow/stack.py) and passed in
    here; only the narrow z1 part runs inside the scan.  conv1 has no bias
    (do_actnorm=True), so the split is exact.
    """
    zc = z1.shape[-1]
    w_z = params["conv1"]["w"][:, :, :zc, :]
    h = conv2d(z1, w_z, compute_dtype=compute_dtype) + u_contrib
    h, _ = actnorm.forward(params["conv1"]["actnorm"], h)
    h = jax.nn.relu(h)
    h = jax.nn.relu(apply_conv_actnorm(params["conv2"], h, compute_dtype))
    return apply_conv_zeros(params["conv3"], h)


def calib_fcn(params, x):
    p1, x = calib_conv_actnorm(params["conv1"], x)
    x = jax.nn.relu(x)
    p2, x = calib_conv_actnorm(params["conv2"], x)
    x = jax.nn.relu(x)
    y = apply_conv_zeros(params["conv3"], x)
    return {"conv1": p1, "conv2": p2, "conv3": params["conv3"]}, y


# ------------------------------------------------------------------------ DenseBlock
def init_dense_block(key, cin, cout, gc=32, dtype=jnp.float32):
    """5-conv dense block; conv5 zero-init so the coupling starts as identity."""
    keys = jax.random.split(key, 4)
    p = {}
    for i, k in enumerate(keys):
        ci = cin + i * gc
        p[f"conv{i + 1}"] = {
            "w": xavier_normal(k, (3, 3, ci, gc), 0.1, dtype),
            "b": jnp.zeros((gc,), dtype),
        }
    p["conv5"] = {
        "w": jnp.zeros((3, 3, cin + 4 * gc, cout), dtype),
        "b": jnp.zeros((cout,), dtype),
    }
    return p


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def apply_dense_block(params, x, compute_dtype=None):
    cd = compute_dtype
    x1 = _lrelu(conv2d(x, params["conv1"]["w"], params["conv1"]["b"], compute_dtype=cd))
    x2 = _lrelu(conv2d(jnp.concatenate([x, x1], -1), params["conv2"]["w"],
                       params["conv2"]["b"], compute_dtype=cd))
    x3 = _lrelu(conv2d(jnp.concatenate([x, x1, x2], -1), params["conv3"]["w"],
                       params["conv3"]["b"], compute_dtype=cd))
    x4 = _lrelu(conv2d(jnp.concatenate([x, x1, x2, x3], -1), params["conv4"]["w"],
                       params["conv4"]["b"], compute_dtype=cd))
    return conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), params["conv5"]["w"],
                  params["conv5"]["b"], compute_dtype=cd)


# --------------------------------------------------------------- RDB / RRDB encoder
def init_rdb(key, nf=64, gc=32, dtype=jnp.float32):
    """ResidualDenseBlock: xavier(0.1) convs, out = conv_stack(x) * 0.2 + x."""
    keys = jax.random.split(key, 5)
    p = {}
    for i in range(4):
        ci = nf + i * gc
        p[f"conv{i + 1}"] = {
            "w": xavier_normal(keys[i], (3, 3, ci, gc), 0.1, dtype),
            "b": jnp.zeros((gc,), dtype),
        }
    p["conv5"] = {
        "w": xavier_normal(keys[4], (3, 3, nf + 4 * gc, nf), 0.1, dtype),
        "b": jnp.zeros((nf,), dtype),
    }
    return p


def apply_rdb(params, x, compute_dtype=None):
    cd = compute_dtype
    x1 = _lrelu(conv2d(x, params["conv1"]["w"], params["conv1"]["b"], compute_dtype=cd))
    x2 = _lrelu(conv2d(jnp.concatenate([x, x1], -1), params["conv2"]["w"],
                       params["conv2"]["b"], compute_dtype=cd))
    x3 = _lrelu(conv2d(jnp.concatenate([x, x1, x2], -1), params["conv3"]["w"],
                       params["conv3"]["b"], compute_dtype=cd))
    x4 = _lrelu(conv2d(jnp.concatenate([x, x1, x2, x3], -1), params["conv4"]["w"],
                       params["conv4"]["b"], compute_dtype=cd))
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), params["conv5"]["w"],
                params["conv5"]["b"], compute_dtype=cd)
    return x5 * 0.2 + x


def apply_rdb_scatter(params, x, compute_dtype=None):
    """RDB in "scatter" form: each feature's contributions to ALL later convs are one
    wide conv.

    The canonical dense block runs five convs with narrow (gc=32) outputs — at most
    25% MXU lane utilization.  By linearity, conv_i(cat(x, x1..x_{i-1})) splits into
    per-input-slice convs; grouping by *source* instead of *destination* turns the
    computation into one N=(4*gc+nf) conv from x plus four progressively narrower
    convs from x1..x4 — identical math (same weights, re-sliced), much wider matmuls.
    """
    cd = compute_dtype
    ws = [params[f"conv{i}"]["w"] for i in range(1, 6)]
    bs = [params[f"conv{i}"]["b"] for i in range(1, 6)]
    nf = ws[0].shape[2]
    gc = ws[0].shape[3]
    outs = [w.shape[3] for w in ws]  # gc, gc, gc, gc, nf
    bounds = [0]
    for o in outs:
        bounds.append(bounds[-1] + o)

    # contributions of the RDB input x to every conv (input slice [0:nf])
    wx = jnp.concatenate([w[:, :, :nf, :] for w in ws], axis=-1)
    cx = conv2d(x, wx, jnp.concatenate(bs), compute_dtype=cd)

    def seg(c, lo_conv, i):
        """slice of concat-output c corresponding to conv i (0-based), where c covers
        convs lo_conv..4"""
        off = sum(outs[j] for j in range(lo_conv, i))
        return c[..., off : off + outs[i]]

    feats = []  # x1..x4
    contribs = [cx]  # conv outputs grouped by source; contribs[s] covers convs s..4
    acc = [None] * 5
    for i in range(4):  # produce x_{i+1} from conv i
        total = seg(cx, 0, i)
        for s in range(1, i + 1):
            total = total + seg(contribs[s], s, i)
        h = _lrelu(total)
        feats.append(h)
        # conv weights of convs i+1..4 that consume feature h (input slice nf+i*gc)
        lo = nf + i * gc
        w_h = jnp.concatenate([ws[j][:, :, lo : lo + gc, :] for j in range(i + 1, 5)], -1)
        contribs.append(conv2d(h, w_h, compute_dtype=cd))
    out5 = seg(cx, 0, 4)
    for s in range(1, 5):
        out5 = out5 + seg(contribs[s], s, 4)
    return out5 * 0.2 + x


def init_rrdb(key, nf=64, gc=32, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "rdb1": init_rdb(k1, nf, gc, dtype),
        "rdb2": init_rdb(k2, nf, gc, dtype),
        "rdb3": init_rdb(k3, nf, gc, dtype),
    }


def apply_rrdb(params, x, compute_dtype=None):
    # scatter form is ~10% faster on TPU at bf16 (wider matmuls); identical math
    rdb = apply_rdb_scatter if compute_dtype is not None else apply_rdb
    out = rdb(params["rdb1"], x, compute_dtype)
    out = rdb(params["rdb2"], out, compute_dtype)
    out = rdb(params["rdb3"], out, compute_dtype)
    return out * 0.2 + x


def init_rrdb_trunk(key, nb, nf=64, gc=32, dtype=jnp.float32):
    """nb stacked RRDBs with a leading stack axis, executed with lax.scan."""
    keys = jax.random.split(key, nb)
    per = [init_rrdb(k, nf, gc, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def apply_rrdb_trunk(params, x, compute_dtype=None, remat: bool = False):
    def body(h, p):
        return apply_rrdb(p, h, compute_dtype), None

    if remat:
        body = jax.checkpoint(body)
    y, _ = lax.scan(body, x, params)
    return y
