"""Window packing: run G independent sliding windows as one UNet call by
stacking them in the channel dimension with block-diagonal weights.

Why: the production BasicUNet is 32 channels wide, but the TPU MXU contracts
onto 128 lanes — a 32-channel convolution can use at most a quarter of the
array, and XLA's 3D conv emitter measures ~17 TFLOP/s on v5e for the
32→32 @96×96×64 layer. The same emitter measures ~103 TFLOP/s at C=128.
Packing G=4 windows channel-wise turns every 32-channel conv into a dense
128-channel conv whose weight matrix is block-diagonal (one block per
window): 4× the nominal FLOPs, but at ~4× the efficiency < net ~1.5× faster
wall-clock per window, with zero custom kernels and no layout churn.

Semantics are exact: zero off-diagonal weights contribute exact-zero terms,
instance-norm statistics are per-channel (= per-window), and pooling /
mish / deconv / concat all act per-channel. The packed model is the SAME
``basic_unet_apply`` running on packed parameters — only the parameter
pytree and the (B, ..., 1)→(B/G, ..., G) window reshape change.

Replaces the role of torch.nn.DataParallel batch scattering in the
reference (inference.py:217-219) as the intra-chip batching strategy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig


def _block_diag_conv(w, G):
    """(kz, ky, kx, ci, co) → (kz, ky, kx, G·ci, G·co) block-diagonal."""
    kz, ky, kx, ci, co = w.shape
    out = jnp.zeros((kz, ky, kx, G * ci, G * co), w.dtype)
    for g in range(G):
        out = out.at[..., g * ci : (g + 1) * ci, g * co : (g + 1) * co].set(w)
    return out


def _block_diag_upcat_conv(w, c_skip, c_up, G):
    """First conv of an UpCat block: its input channels are the concat
    [skip(G·c_skip) | up(G·c_up)], so window g's rows live at
    {g·c_skip ..} ∪ {G·c_skip + g·c_up ..}."""
    kz, ky, kx, ci, co = w.shape
    assert ci == c_skip + c_up
    out = jnp.zeros((kz, ky, kx, G * ci, G * co), w.dtype)
    for g in range(G):
        cols = slice(g * co, (g + 1) * co)
        out = out.at[
            ..., g * c_skip : (g + 1) * c_skip, cols
        ].set(w[..., :c_skip, :])
        out = out.at[
            ..., G * c_skip + g * c_up : G * c_skip + (g + 1) * c_up, cols
        ].set(w[..., c_skip:, :])
    return out


def _block_diag_deconv(w, G):
    """(ci, co, 2, 2, 2) torch ConvTranspose3d layout → (G·ci, G·co, 2,2,2)."""
    ci, co = w.shape[:2]
    out = jnp.zeros((G * ci, G * co, *w.shape[2:]), w.dtype)
    for g in range(G):
        out = out.at[g * ci : (g + 1) * ci, g * co : (g + 1) * co].set(w)
    return out


def _tile(v, G):
    return jnp.tile(v, G)


def _pack_conv_block(p, G):
    return {
        "w": _block_diag_conv(p["w"], G),
        "b": _tile(p["b"], G),
        "scale": _tile(p["scale"], G),
        "bias": _tile(p["bias"], G),
    }


def _pack_upcat_conv_block(p, c_skip, c_up, G):
    return {
        "w": _block_diag_upcat_conv(p["w"], c_skip, c_up, G),
        "b": _tile(p["b"], G),
        "scale": _tile(p["scale"], G),
        "bias": _tile(p["bias"], G),
    }


def pack_params(params, G: int):
    """Pack a BasicUNet parameter pytree for G-window channel packing."""
    packed = {}
    for name in ("conv_0", "down_1", "down_2", "down_3", "down_4"):
        packed[name] = {
            "conv_0": _pack_conv_block(params[name]["conv_0"], G),
            "conv_1": _pack_conv_block(params[name]["conv_1"], G),
        }
    for name in ("upcat_4", "upcat_3", "upcat_2", "upcat_1"):
        p = params[name]
        c_up = p["deconv_w"].shape[1]
        c_in_total = p["conv_0"]["w"].shape[3]
        c_skip = c_in_total - c_up
        packed[name] = {
            "conv_0": _pack_upcat_conv_block(p["conv_0"], c_skip, c_up, G),
            "conv_1": _pack_conv_block(p["conv_1"], G),
            "deconv_w": _block_diag_deconv(p["deconv_w"], G),
            "deconv_b": _tile(p["deconv_b"], G),
        }
    fw = params["final"]["w"]  # (1,1,1, f5, out)
    packed["final"] = {
        "w": _block_diag_conv(fw, G),
        "b": _tile(params["final"]["b"], G),
    }
    return packed


def pack_config(config: BasicUNetConfig, G: int) -> BasicUNetConfig:
    import dataclasses

    return dataclasses.replace(
        config,
        in_channels=config.in_channels * G,
        out_channels=config.out_channels * G,
        features=tuple(f * G for f in config.features),
    )


def pack_windows(x, G: int):
    """(B, z, y, x, 1) window batch → (B/G, z, y, x, G); B % G == 0."""
    b = x.shape[0]
    assert b % G == 0, f"batch {b} not divisible by pack factor {G}"
    # (B, z, y, x) grouped so window g*G+i → group g, channel i
    xw = x[..., 0].reshape(b // G, G, *x.shape[1:4])
    return jnp.moveaxis(xw, 1, -1)


def unpack_logits(y, G: int):
    """(B/G, z, y, x, G) → (B, z, y, x, 1)."""
    yb = jnp.moveaxis(y, -1, 1)
    return yb.reshape(yb.shape[0] * G, *yb.shape[2:])[..., None]
