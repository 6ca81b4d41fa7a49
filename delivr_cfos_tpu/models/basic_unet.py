"""3D BasicUNet in functional JAX, topology-compatible with MONAI's BasicUNet.

The reference builds ``monai.networks.nets.BasicUNet(spatial_dims=3,
in_channels=1, out_channels=1, features=(32, 32, 64, 128, 256, 32),
dropout=0.1, act="mish")`` and runs it under ``model.eval()``
(reference: inference/inference.py:190-197,261-262), i.e. dropout is inactive
and instance-norm uses per-sample statistics. This module reproduces that
computation TPU-first:

- layout is **NDHWC** (channels-last) — the native layout for TPU convolutions;
- the 2×2×2 stride-2 transposed convolutions are lowered to a single matmul
  plus a block-interleave reshape (pure MXU work, no scatter);
- instance norm + mish are plain VPU element-wise ops that XLA fuses into the
  surrounding convolutions;
- parameters live in a plain nested-dict pytree so ``pjit``/``shard_map`` can
  annotate shardings without framework indirection.

Topology (encoder features f0..f4, decoder feature f5):

    conv_0: TwoConv(in → f0)
    down_i: maxpool2 + TwoConv(f_{i-1} → f_i)          i = 1..4
    upcat_4: deconv(f4 → f3) ⧺ skip f3 → TwoConv(→ f3)
    upcat_3: deconv(f3 → f2) ⧺ skip f2 → TwoConv(→ f2)
    upcat_2: deconv(f2 → f1) ⧺ skip f1 → TwoConv(→ f1)
    upcat_1: deconv(f1 → f1) ⧺ skip f0 → TwoConv(→ f5)   (no channel halving)
    final:  1×1×1 conv (f5 → out)

Each conv block is conv3×3×3(+bias) → instance-norm(affine) → mish, matching
MONAI's Convolution with adn_ordering="NDA" at eval time. Skip concatenation
order is [encoder, upsampled], matching MONAI's ``torch.cat([x_e, x_0])``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_FEATURES = (32, 32, 64, 128, 256, 32)
_IN_EPS = 1e-5  # torch InstanceNorm3d default


@dataclass(frozen=True)
class BasicUNetConfig:
    in_channels: int = 1
    out_channels: int = 1
    features: tuple = DEFAULT_FEATURES
    compute_dtype: jnp.dtype = jnp.float32
    # MXU precision for convs/matmuls. 'highest' keeps true f32 accumulation
    # on TPU (needed for cell-count parity with the reference); set to
    # 'default' to allow bf16 passes on the MXU when benchmarking speed.
    precision: str = "highest"
    # conv lowering: 'xla3d' = one lax 3D convolution (bit-stable parity
    # path); 'z2d' = three z-tap 2D convolutions summed — mathematically the
    # same SAME conv, but measured 1.4× faster on TPU v5e because XLA's 2D
    # conv emitter keeps im2col patches in VMEM where the 3D emitter spills
    # (probe: 16.2 → 23.0 TFLOP/s on the 32→32 @96×96×64 layer). Summation
    # order differs (3 groups of 9 taps), so keep 'xla3d' for parity runs.
    conv_impl: str = "xla3d"
    # fuse the instance-norm + mish epilogue into the Pallas two-phase
    # VMEM kernel (ops/pallas/fused_norm_mish.py) instead of XLA's
    # reduce+elementwise pair. Same math modulo f32 sum order.
    fused_in_mish: bool = False

    @staticmethod
    def fast(**overrides) -> "BasicUNetConfig":
        """TPU throughput preset: bf16 activations with f32 conv
        accumulation and f32 instance-norm statistics, on the
        channels-sublane Pallas conv path ('pallas_cs': 50 vs 91 ms per
        batch-8 window pass against the NDHWC XLA path on v5e — PERF.md;
        falls back to NDHWC automatically for non-16-divisible shapes).
        ~10× the parity config; logits differ from the f32 path only at
        bf16 accumulation-order level."""
        kw = dict(
            compute_dtype=jnp.bfloat16,
            precision="default",
            conv_impl="pallas_cs",
        )
        kw.update(overrides)
        return BasicUNetConfig(**kw)


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


def _conv3d(x, w, b):
    """3×3×3 SAME convolution, NDHWC × DHWIO → NDHWC."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b.astype(x.dtype)


def _conv3d_z2d(x, w, b):
    """The same 3×3×3 SAME convolution lowered as three z-tap convolutions
    with a 1×3×3 kernel, summed. Identical math (modulo fp summation order);
    the z taps shift via pad+slice so each remaining conv is effectively 2D,
    which XLA's TPU emitter handles with on-chip patches. Stays 5D NDHWC
    throughout — a (N·D, H, W, C) reshape variant measured faster in
    isolation but triggered catastrophic layout copies in the full graph."""
    n, d, h, wd, ci = x.shape
    co = w.shape[-1]
    wt = w.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = jax.lax.slice_in_dim(xp, dz, dz + d, axis=1)
        y = jax.lax.conv_general_dilated(
            xs,
            wt[dz : dz + 1],
            window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = y if out is None else out + y
    return out + b.astype(x.dtype)


def _instance_norm(x, scale, bias):
    """Per-sample, per-channel normalization over spatial dims (eval-mode
    InstanceNorm3d semantics: track_running_stats=False). Statistics are
    always computed in float32: a 96·96·64 window sums ~590k elements per
    channel, far beyond bf16 mantissa range."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + _IN_EPS)
    out = (xf - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _mish(x):
    """x·tanh(softplus(x)), evaluated in f32 (softplus underflows in bf16);
    XLA fuses the casts into the surrounding elementwise loop."""
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def _conv_block(x, p, config):
    """conv → instance-norm → mish (MONAI Convolution, adn_ordering='NDA',
    dropout inactive at eval)."""
    conv = _conv3d_z2d if config.conv_impl == "z2d" else _conv3d
    x = conv(x, p["w"], p["b"])
    if config.fused_in_mish:
        from delivr_cfos_tpu.ops.pallas.fused_norm_mish import (
            instance_norm_mish_pallas,
        )

        # compiled Mosaic kernel on TPU; interpreter elsewhere (CPU tests)
        return instance_norm_mish_pallas(
            x, p["scale"], p["bias"], interpret=jax.default_backend() != "tpu"
        )
    x = _instance_norm(x, p["scale"], p["bias"])
    return _mish(x)


def _two_conv(x, p, config):
    x = _conv_block(x, p["conv_0"], config)
    return _conv_block(x, p["conv_1"], config)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding="VALID",
    )


def _deconv2x(x, w, b):
    """2×2×2 stride-2 transposed convolution (torch ConvTranspose3d layout
    ``w``: (I, O, 2, 2, 2)), lowered with ``lax.conv_transpose``.

    A matmul + block-interleave lowering (one (N·D·H·W, I) @ (I, 8·O) dot
    then reshape/transpose) computes the same thing, but the interleave
    transpose materializes full-resolution copies — XLA's conv_transpose
    emitter measured ~16% faster for the whole model on v5e (PERF.md).
    Kernel taps are spatially flipped because conv_transpose with
    ``transpose_kernel=False`` cross-correlates where ConvTranspose3d
    convolves (for stride == kernel size the flip just permutes the 2³
    output phases).
    """
    wt = jnp.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x,
        wt,
        strides=(2, 2, 2),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b.astype(x.dtype)


def _deconv2x_matmul(x, w, b):
    """Reference lowering of ``_deconv2x`` (matmul + block interleave);
    kept for equivalence testing."""
    n, d, h, wd, i = x.shape
    o = w.shape[1]
    wm = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(i, 8 * o)  # (I, dz·dy·dx·O)
    y = jnp.dot(
        x.reshape(-1, i), wm.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    y = y.reshape(n, d, h, wd, 2, 2, 2, o)
    # (n, d, 2, h, 2, w, 2, o) → (n, 2d, 2h, 2w, o)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(n, 2 * d, 2 * h, 2 * wd, o)
    return y + b.astype(x.dtype)


def _upcat(x, x_skip, p, config):
    x0 = _deconv2x(x, p["deconv_w"], p["deconv_b"])
    # MONAI pads the upsampled tensor by one (replicate) on dims where the
    # encoder feature is larger (odd input sizes). Shapes are static in JAX,
    # so this resolves at trace time.
    pads = []
    for ax in (1, 2, 3):
        diff = x_skip.shape[ax] - x0.shape[ax]
        pads.append((0, diff))
    if any(p_[1] for p_ in pads):
        x0 = jnp.pad(
            x0,
            ((0, 0), pads[0], pads[1], pads[2], (0, 0)),
            mode="edge",
        )
    x = jnp.concatenate([x_skip.astype(x0.dtype), x0], axis=-1)
    return _two_conv(x, p, config)


# --------------------------------------------------------------------------
# model
# --------------------------------------------------------------------------


def basic_unet_apply(params, x, config: BasicUNetConfig = BasicUNetConfig()):
    """Forward pass. ``x``: (N, D, H, W, C_in) → logits (N, D, H, W, C_out)."""
    with jax.default_matmul_precision(config.precision):
        if config.conv_impl == "pallas_cs":
            if all(s % 16 == 0 for s in x.shape[1:4]):
                from delivr_cfos_tpu.models.basic_unet_cs import apply_cs

                return apply_cs(params, x, config)
            # CS path needs 16-divisible dims (4 pool levels); fall back
            return _apply(params, x, config)
        return _apply(params, x, config)


def _apply(params, x, config: BasicUNetConfig):
    x = x.astype(config.compute_dtype)
    x0 = _two_conv(x, params["conv_0"], config)
    x1 = _two_conv(_maxpool2(x0), params["down_1"], config)
    x2 = _two_conv(_maxpool2(x1), params["down_2"], config)
    x3 = _two_conv(_maxpool2(x2), params["down_3"], config)
    x4 = _two_conv(_maxpool2(x3), params["down_4"], config)
    u4 = _upcat(x4, x3, params["upcat_4"], config)
    u3 = _upcat(u4, x2, params["upcat_3"], config)
    u2 = _upcat(u3, x1, params["upcat_2"], config)
    u1 = _upcat(u2, x0, params["upcat_1"], config)
    logits = jax.lax.conv_general_dilated(
        u1,
        params["final"]["w"].astype(u1.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + params["final"]["b"].astype(u1.dtype)
    return logits


# --------------------------------------------------------------------------
# initialization (kaiming-uniform, torch Conv default — for tests/training)
# --------------------------------------------------------------------------


def _init_conv_block(key, c_in, c_out, k=3):
    k1, k2 = jax.random.split(key)
    fan_in = c_in * k**3
    bound = float(1.0 / np.sqrt(fan_in))
    gain = float(np.sqrt(2.0 / (1 + 5**2)))  # torch kaiming a=sqrt(5)
    wbound = gain * float(np.sqrt(3.0 / fan_in))
    return {
        "w": jax.random.uniform(k1, (k, k, k, c_in, c_out), jnp.float32, -wbound, wbound),
        "b": jax.random.uniform(k2, (c_out,), jnp.float32, -bound, bound),
        "scale": jnp.ones((c_out,), jnp.float32),
        "bias": jnp.zeros((c_out,), jnp.float32),
    }


def init_params(key, config: BasicUNetConfig = BasicUNetConfig()):
    f = config.features
    cin = config.in_channels
    keys = iter(jax.random.split(key, 64))

    def two_conv(c_in, c_mid, c_out):
        return {
            "conv_0": _init_conv_block(next(keys), c_in, c_mid),
            "conv_1": _init_conv_block(next(keys), c_mid, c_out),
        }

    def upcat(c_in, c_up, c_skip, c_out):
        fan_in = c_in * 8
        bound = float(1.0 / np.sqrt(fan_in))
        p = two_conv(c_skip + c_up, c_out, c_out)
        p["deconv_w"] = jax.random.uniform(
            next(keys), (c_in, c_up, 2, 2, 2), jnp.float32, -bound, bound
        )
        p["deconv_b"] = jax.random.uniform(
            next(keys), (c_up,), jnp.float32, -bound, bound
        )
        return p

    params = {
        "conv_0": two_conv(cin, f[0], f[0]),
        "down_1": two_conv(f[0], f[1], f[1]),
        "down_2": two_conv(f[1], f[2], f[2]),
        "down_3": two_conv(f[2], f[3], f[3]),
        "down_4": two_conv(f[3], f[4], f[4]),
        "upcat_4": upcat(f[4], f[3], f[3], f[3]),
        "upcat_3": upcat(f[3], f[2], f[2], f[2]),
        "upcat_2": upcat(f[2], f[1], f[1], f[1]),
        "upcat_1": upcat(f[1], f[1], f[0], f[5]),  # halves=False
        "final": {
            "w": jax.random.uniform(
                next(keys),
                (1, 1, 1, f[5], config.out_channels),
                jnp.float32,
                -float(np.sqrt(1.0 / f[5])),
                float(np.sqrt(1.0 / f[5])),
            ),
            "b": jnp.zeros((config.out_channels,), jnp.float32),
        },
    }
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def infer_model_config(
    params, compute_dtype=jnp.float32, precision="highest", conv_impl="xla3d"
) -> BasicUNetConfig:
    """Reconstruct the architecture config from a loaded param pytree."""
    features = (
        int(params["conv_0"]["conv_1"]["w"].shape[-1]),
        int(params["down_1"]["conv_1"]["w"].shape[-1]),
        int(params["down_2"]["conv_1"]["w"].shape[-1]),
        int(params["down_3"]["conv_1"]["w"].shape[-1]),
        int(params["down_4"]["conv_1"]["w"].shape[-1]),
        int(params["upcat_1"]["conv_1"]["w"].shape[-1]),
    )
    return BasicUNetConfig(
        in_channels=int(params["conv_0"]["conv_0"]["w"].shape[-2]),
        out_channels=int(params["final"]["w"].shape[-1]),
        features=features,
        compute_dtype=compute_dtype,
        precision=precision,
        conv_impl=conv_impl,
    )
