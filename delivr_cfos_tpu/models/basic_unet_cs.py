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

import os

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


def _deconv_impl() -> str:
    """'convt' (lax.conv_transpose) or 'dot' (single phase-major matmul +
    one raster transpose) — A/B measured on TPU, see _deconv2x_cs."""
    return os.environ.get("DELIVR_DECONV_IMPL", "convt")


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


def _in_affine_from_stats(stats, scale, bias, n_vox):
    """Per-plane (Σx, Σx²) from the conv kernel → per-(B, C) affine factors
    a = inv·scale, c = bias − mean·a such that IN(x)·scale + bias = x·a + c."""
    s = jnp.sum(stats, axis=1)  # (B, 2, C) f32
    mean = s[:, 0] / n_vox
    var = jnp.maximum(s[:, 1] / n_vox - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _IN_EPS)
    a = inv * scale.astype(jnp.float32)[None, :]
    c = bias.astype(jnp.float32)[None, :] - mean * a
    return a, c


def _affine_mish_cs(x, a, c):
    """mish(x·a + c) per (B, C) — the one remaining elementwise pass when the
    consumer is not a Pallas conv (pool / deconv / concat / final dot)."""
    xf = x.astype(jnp.float32)
    v = xf * a[:, None, :, None] + c[:, None, :, None]
    return (v * jnp.tanh(jax.nn.softplus(v))).astype(x.dtype)


def _fused_eligible(x, h, wd):
    """The fused conv→IN→mish→conv chain needs both convs on the Pallas
    kernel (same plane-size gate as _conv_cs)."""
    min_plane = _PALLAS_MIN_PLANE if not _interpret() else 1024
    return h * wd >= min_plane


def _two_conv_cs(x, p, h, wd, pair=None):
    """conv → IN → mish → conv → IN → mish. On Pallas-eligible planes each
    conv emits per-plane Σx/Σx² alongside its output, so the InstanceNorm
    statistics never re-read the conv output from HBM; normalize+mish then
    runs as ONE fused XLA elementwise pass per block (read + write).

    Measured on TPU v5e (batch-8 window pass): 41.8 ms vs 42.5 unfused vs
    43.7 for the deeper variant that also applies normalize+mish as the
    consumer conv's in-kernel prologue — the prologue's per-step (B, C)
    affine operands stage through ms-level copy-start stalls at the Pallas
    call boundary, costing more than the saved elementwise pass. The
    prologue path (conv3d_cs ``in_affine``) stays available and tested.
    Reference semantics: MONAI TwoConv (basic_unet.py; tolerances at bf16
    rounding level — fast mode only).

    ``pair=(x2, bias2)``: the first conv runs in the kernel's pair mode —
    it convolves the in-VMEM concat of ``x`` and ``x2`` (with ``bias2``
    folded into ``x2``'s plane loads), bit-identical to convolving
    ``concat([x, x2 + bias2])`` but with no HBM concat or broadcast-add
    (the UpCat fast path). Caller guarantees Pallas eligibility."""
    if not _fused_eligible(x, h, wd):
        assert pair is None
        x = _conv_block_cs(x, p["conv_0"], h, wd)
        return _conv_block_cs(x, p["conv_1"], h, wd)
    p0, p1 = p["conv_0"], p["conv_1"]
    n_vox = x.shape[1] * h * wd  # (D, S) per (B, C)
    # conv biases are omitted: exactly cancelled by each IN (see
    # _conv_stats_cs) — y0/y1 are biasless but a·y' + c reproduces the
    # biased IN output bit-for-bit at the math level
    y0, st0 = _conv_stats_cs(x, p0["w"], h, wd, pair=pair)
    a0, c0 = _in_affine_from_stats(st0, p0["scale"], p0["bias"], n_vox)
    y0 = _affine_mish_cs(y0, a0, c0)
    y1, st1 = _conv_stats_cs(y0, p1["w"], h, wd)
    a1, c1 = _in_affine_from_stats(st1, p1["scale"], p1["bias"], n_vox)
    return _affine_mish_cs(y1, a1, c1)


def _conv_stats_cs(x, w, h, wd, pair=None):
    """Pallas conv with stats output; pads odd C_in like _conv_cs.

    Passes ``bias=None``: the conv bias is a mathematical no-op under the
    InstanceNorm that follows (IN subtracts the per-(B, C) mean and the
    bias also cancels out of the stats→affine derivation — variance is
    shift-invariant, and c = bias_IN − mean·a is identical computed from
    biasless statistics), so the kernel never stages the bias operand.

    ``pair=(x2, bias2)``: kernel pair mode; ``w`` is split by ``x``'s
    channel count into the two inputs' weight slices (the kernel's
    in-VMEM concat is channel-ordered [x; x2], matching
    ``concat([x, x2])`` through the full weight tensor)."""
    if pair is not None:
        x2, bias2 = pair
        c1 = x.shape[2]
        return conv3d_cs(
            x, w[:, :, :, :c1], None, h=h, w=wd, interpret=_interpret(),
            emit_stats=True, pair=(x2, w[:, :, :, c1:], bias2),
        )
    if x.shape[2] % 2:
        x = jnp.concatenate(
            [x, jnp.zeros((*x.shape[:2], 1, x.shape[3]), x.dtype)], axis=2
        )
        w = jnp.concatenate(
            [w, jnp.zeros((*w.shape[:3], 1, w.shape[4]), w.dtype)], axis=3
        )
    return conv3d_cs(x, w, None, h=h, w=wd, interpret=_interpret(),
                     emit_stats=True)


def _maxpool2_cs(x, h, wd):
    """2× max-pool via pairwise maxima. Max is exact (no rounding), so
    every decomposition is bit-identical; only the LAYOUT cost differs.
    Default ('d4slice', probed in scripts/probe_pool.py on the level-0
    shape): free d-pool (major-dim split), then ONE reshape exposing the
    h/w pair axes and a maximum over its four strided phase slices — XLA
    fuses the four reads into one kLoop pass with no materialized
    intermediate. The r5 trace of the previous default ('dfirst', pool
    d → h → w stepwise) showed its h-step materializing a reshape
    (1.12 ms) plus a {1,2,5,3,0,4} relayout copy (1.28 ms) at level 0;
    probe: d4slice 5.90 vs dfirst 8.25 vs wfirst 8.20 vs reduce_window
    10.45 ms. Older formulations stay available via DELIVR_POOL_IMPL."""
    b, d, c, s = x.shape
    impl = os.environ.get("DELIVR_POOL_IMPL", "d4slice")
    if impl == "wfirst":
        y = x.reshape(b, d, c, h, wd // 2, 2)
        y = jnp.maximum(y[..., 0], y[..., 1])  # pool w
        y = y.reshape(b, d, c, h // 2, 2, wd // 2)
        y = jnp.maximum(y[:, :, :, :, 0], y[:, :, :, :, 1])  # pool h
        y = y.reshape(b, d // 2, 2, c, (h // 2) * (wd // 2))
        y = jnp.maximum(y[:, :, 0], y[:, :, 1])  # pool d
        return y, h // 2, wd // 2
    if impl == "dfirst":
        y = x.reshape(b, d // 2, 2, c, s)
        y = jnp.maximum(y[:, :, 0], y[:, :, 1])  # pool d (major: free split)
        y = y.reshape(b, d // 2, c, h // 2, 2, wd)
        y = jnp.maximum(y[:, :, :, :, 0], y[:, :, :, :, 1])  # pool h
        y = y.reshape(b, d // 2, c, (h // 2) * (wd // 2), 2)
        y = jnp.maximum(y[..., 0], y[..., 1])  # pool w (4x-smaller tensor)
        return y, h // 2, wd // 2
    # pool d via strided slices on the MAJOR dim (no (d/2, 2) reshape),
    # then ONE reshape exposing the h/w pair axes and a fused maximum over
    # its four phase slices. In-model every d-pool formulation draws a
    # D-minor relayout copy from XLA; this ordering puts it on the
    # already-d-halved tensor (in-model trace: pool chain ~4.4 ms (r5
    # dfirst) → ~2.4 ms; hw-first moved the relayout to the full-res
    # tensor and measured worse, 35.0 vs 34.6 ms/forward).
    y = jnp.maximum(x[:, 0::2], x[:, 1::2])
    v = y.reshape(b, d // 2, c, h // 2, 2, wd // 2, 2)
    m = jnp.maximum(
        jnp.maximum(v[:, :, :, :, 0, :, 0], v[:, :, :, :, 0, :, 1]),
        jnp.maximum(v[:, :, :, :, 1, :, 0], v[:, :, :, :, 1, :, 1]),
    )
    return m.reshape(b, d // 2, c, (h // 2) * (wd // 2)), h // 2, wd // 2


def _deconv2x_cs(x, w, b, h, wd):
    """(B, D, C, S) → (B, 2D, O, 4S): 2×2×2 stride-2 transposed conv.

    Two formulations, selected by ``DELIVR_DECONV_IMPL``:

    - ``dot`` — one MXU dot to the phase-major tensor (B, D, S, 8·O)
      (stride-2 kernel-2 transposed conv touches each input voxel exactly
      once per (a, b2, c2) output phase, so the whole deconv is the single
      matmul x · W[c, (a, b2, c2, o)]) followed by ONE transpose into
      raster order. The conv_transpose route paid fusion (2.19 ms) + a
      canonical-layout copy (2.24 ms) + an input-layout copy (1.17 ms) at
      the upcat_1 shape (r5 trace); this pays the dot + one copy.
    - ``convt`` — ``lax.conv_transpose`` over (B, D, C, H, W) in NDCHW
      (the r3–r5 default; measured 6.9 vs 31.7 ms against the r3 explicit
      dot variant that transposed into a hostile layout).

    Weights are torch ConvTranspose3d layout (C_in, C_out, 2, 2, 2)
    (reference: inference.py:190-197 via MONAI UpCat). Both routes
    accumulate in f32 and round once to bf16 — bit-identical outputs
    (asserted in tests/test_pallas_kernels.py).

    ``b=None`` skips the bias broadcast-add (the UpCat fast path folds it
    into the consumer conv's plane loads instead, bit-identically)."""
    bsz, d, c, s = x.shape
    o = w.shape[1]
    if _deconv_impl() == "dot":
        # torch ConvTranspose3d stride=kernel=2: out[2i+a] = Σ_c x[i]·w[a]
        # — phase a taps kernel index a directly, no flip
        w8 = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(c, 8 * o)
        y = jax.lax.dot_general(
            x,
            w8.astype(x.dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (B, D, S, (a, b2, c2, O))
        y = y.reshape(bsz, d, h, wd, 2, 2, 2, o)
        # (B, D, h, wd, a, b2, c2, O) → (B, D, a, O, h, b2, wd, c2)
        y = jnp.transpose(y, (0, 1, 4, 7, 2, 5, 3, 6))
        y = y.reshape(bsz, 2 * d, o, (2 * h) * (2 * wd))
    else:
        xg = x.reshape(bsz, d, c, h, wd)
        wt = jnp.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]
        y = jax.lax.conv_transpose(
            xg,
            wt.astype(x.dtype),
            strides=(2, 2, 2),
            padding="VALID",
            dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
        )
        y = y.reshape(bsz, 2 * d, o, (2 * h) * (2 * wd))
    if b is None:
        return y
    return y + b.astype(x.dtype)[None, None, :, None]


def _upcat_cs(x, x_skip, p, h, wd):
    """h, wd are the SKIP level's plane dims (deconv output dims).

    On Pallas-eligible planes the concat never materializes: the first
    TwoConv conv runs in kernel pair mode over (skip, raw deconv output)
    with the deconv bias folded into the deconv half's plane loads —
    bit-identical to concat([skip, deconv+bias]) → conv, minus the HBM
    concat fusion and the full-resolution broadcast-add (VERDICT r4
    item 4 lever; trace: the upcat_1 concat alone was ~1.8 ms/step)."""
    if _fused_eligible(x_skip, h, wd):
        x0 = _deconv2x_cs(x, p["deconv_w"], None, h // 2, wd // 2)
        return _two_conv_cs(
            x_skip.astype(x0.dtype), p, h, wd, pair=(x0, p["deconv_b"])
        )
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
