"""BasicUNet forward pass in channels-sublane / spatial-lane layout.

The (B, D, C, H·W)-native twin of ``basic_unet._apply``, selected with
``BasicUNetConfig(conv_impl='pallas_cs')``: full-resolution convolutions run
in the Pallas kernel (`ops/pallas/conv3d_cs.py`, 33.7 TFLOP/s = 2.1× XLA's
emitter at this model's channel widths — PERF.md), while the cheap low-
resolution levels round-trip through XLA's NDHWC conv (their tensors are
~64× smaller, so the layout conversion is noise). Instance norm, mish,
pooling, deconv and skips all operate natively on (B, D, C, S), so no
full-resolution layout conversion ever happens outside the entry/exit
reshapes of the 1-channel input/output (which are free).

Same math as the reference MONAI BasicUNet eval pass (see basic_unet.py);
only summation orders differ (bf16/f32 tolerance level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.ops.pallas.conv3d_cs import conv3d_cs

_IN_EPS = 1e-5

# use the Pallas kernel when the plane has at least this many voxels;
# below it, XLA's NDHWC emitter on the tiny tensors takes over (the
# round-trip transposes there are noise)
_PALLAS_MIN_PLANE = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_cs(x, w, b, h, wd):
    """3³ SAME conv on (B, D, C, S); Pallas for big planes, XLA otherwise.
    Off-TPU (interpreter mode, tests) only the big planes go through the
    kernel — interpretation is slow and the code path is identical."""
    cin = x.shape[2]
    min_plane = _PALLAS_MIN_PLANE if not _interpret() else 1024
    if h * wd >= min_plane:
        if cin % 2:
            # pad to an even channel count for bf16 pair packing
            x = jnp.concatenate(
                [x, jnp.zeros((*x.shape[:2], 1, x.shape[3]), x.dtype)], axis=2
            )
            w = jnp.concatenate(
                [w, jnp.zeros((*w.shape[:3], 1, w.shape[4]), w.dtype)], axis=3
            )
        return conv3d_cs(x, w, b, h=h, w=wd, interpret=_interpret())
    # low-res: XLA NDHWC round trip
    bsz, d, c, s = x.shape
    xh = jnp.transpose(x.reshape(bsz, d, c, h, wd), (0, 1, 3, 4, 2))
    y = jax.lax.conv_general_dilated(
        xh,
        w.astype(xh.dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b.astype(xh.dtype)
    co = y.shape[-1]
    return jnp.transpose(y, (0, 1, 4, 2, 3)).reshape(bsz, d, co, s)


def _instance_norm_cs(x, scale, bias):
    """Eval-mode InstanceNorm over (D, S) per (B, C); f32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + _IN_EPS)
    out = (xf - mean) * inv * scale.astype(jnp.float32)[None, None, :, None]
    out = out + bias.astype(jnp.float32)[None, None, :, None]
    return out.astype(x.dtype)


def _mish_cs(x):
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def _conv_block_cs(x, p, h, wd):
    x = _conv_cs(x, p["w"], p["b"], h, wd)
    x = _instance_norm_cs(x, p["scale"], p["bias"])
    return _mish_cs(x)


def _two_conv_cs(x, p, h, wd):
    x = _conv_block_cs(x, p["conv_0"], h, wd)
    return _conv_block_cs(x, p["conv_1"], h, wd)


def _maxpool2_cs(x, h, wd):
    """2× max-pool via minor-dim reshapes + pairwise maxima — all splits of
    S = h·w are free (contiguous), so this stays pure VPU work; the
    reduce_window formulation measured 7 ms/level-0 on the same shapes
    (layout-hostile window reduction)."""
    b, d, c, s = x.shape
    y = x.reshape(b, d, c, h, wd // 2, 2)
    y = jnp.maximum(y[..., 0], y[..., 1])  # pool w
    y = y.reshape(b, d, c, h // 2, 2, wd // 2)
    y = jnp.maximum(y[:, :, :, :, 0], y[:, :, :, :, 1])  # pool h
    y = y.reshape(b, d // 2, 2, c, (h // 2) * (wd // 2))
    y = jnp.maximum(y[:, :, 0], y[:, :, 1])  # pool d
    return y, h // 2, wd // 2


def _deconv2x_cs(x, w, b, h, wd):
    """(B, D, C, S) → (B, 2D, O, 4S): contract C, interleave the 2³ block."""
    bsz, d, c, s = x.shape
    o = w.shape[1]
    wm = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(c, 8 * o).astype(x.dtype)
    y = jax.lax.dot_general(
        x,
        wm,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # y: (B, D, S, 8O) with 8O = (dz, dy, dx, O)
    y = y.reshape(bsz, d, h, wd, 2, 2, 2, o)
    # → (B, D, dz, O, H, dy, W, dx) → (B, 2D, O, (2h+dy)(2W)+(2w+dx))
    y = jnp.transpose(y, (0, 1, 4, 7, 2, 5, 3, 6))
    y = y.reshape(bsz, 2 * d, o, (2 * h) * (2 * wd))
    return y + b.astype(x.dtype)[None, None, :, None]


def _upcat_cs(x, x_skip, p, h, wd):
    """h, wd are the SKIP level's plane dims (deconv output dims)."""
    x0 = _deconv2x_cs(x, p["deconv_w"], p["deconv_b"], h // 2, wd // 2)
    x = jnp.concatenate([x_skip.astype(x0.dtype), x0], axis=2)
    return _two_conv_cs(x, p, h, wd)


def apply_cs(params, x, config):
    """x: (N, D, H, W, C_in=1) → logits (N, D, H, W, C_out). Spatial dims
    must be divisible by 16 (four pooling levels; the inference windows
    are, config.json:24-28)."""
    n, d, h, wd, cin = x.shape
    assert d % 16 == 0 and h % 16 == 0 and wd % 16 == 0, (
        "pallas_cs path needs dims divisible by 16"
    )
    x = x.astype(config.compute_dtype)
    # (N, D, H, W, C) → (N, D, C, S): free for C = 1
    xcs = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(n, d, cin, h * wd)

    x0 = _two_conv_cs(xcs, params["conv_0"], h, wd)
    p1, h1, w1 = _maxpool2_cs(x0, h, wd)
    x1 = _two_conv_cs(p1, params["down_1"], h1, w1)
    p2, h2, w2 = _maxpool2_cs(x1, h1, w1)
    x2 = _two_conv_cs(p2, params["down_2"], h2, w2)
    p3, h3, w3 = _maxpool2_cs(x2, h2, w2)
    x3 = _two_conv_cs(p3, params["down_3"], h3, w3)
    p4, h4, w4 = _maxpool2_cs(x3, h3, w3)
    x4 = _two_conv_cs(p4, params["down_4"], h4, w4)

    u4 = _upcat_cs(x4, x3, params["upcat_4"], h3, w3)
    u3 = _upcat_cs(u4, x2, params["upcat_3"], h2, w2)
    u2 = _upcat_cs(u3, x1, params["upcat_2"], h1, w1)
    u1 = _upcat_cs(u2, x0, params["upcat_1"], h, wd)

    fw = params["final"]["w"][0, 0, 0]  # (f5, C_out)
    logits = jax.lax.dot_general(
        u1,
        fw.astype(u1.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(u1.dtype)
    # (N, D, S, C_out) → (N, D, H, W, C_out)
    logits = logits + params["final"]["b"].astype(logits.dtype)
    co = logits.shape[-1]
    return logits.reshape(n, d, h, wd, co)
