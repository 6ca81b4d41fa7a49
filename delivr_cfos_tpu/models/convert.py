"""Convert MONAI BasicUNet torch checkpoints to this framework's param pytree.

The reference loads ``torch.load(weights)["state_dict"]`` into a
(possibly DataParallel-wrapped) MONAI BasicUNet
(reference: inference/inference.py:200,217-222); the legacy variant uses the
``"model_state"`` key (reference: inference/inference_nifti_load.py:215). We
accept both, strip the DataParallel ``module.`` prefix, and remap:

    conv_0.conv_{0,1}.conv.{weight,bias}        conv kernels  OIDHW → DHWIO
    conv_0.conv_{0,1}.adn.N.{weight,bias}       instance-norm affine
    down_k.convs.conv_{0,1}.*                   k = 1..4
    upcat_k.upsample.deconv.{weight,bias}       kept as torch (I, O, 2, 2, 2)
    upcat_k.convs.conv_{0,1}.*
    final_conv.{weight,bias}

The deconv kernel stays in torch layout because ``basic_unet._deconv2x``
consumes it directly (matmul lowering).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_block_from(sd: dict, prefix: str) -> dict:
    w = _to_np(sd[f"{prefix}.conv.weight"])  # (O, I, kD, kH, kW)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),  # → DHWIO
        "b": jnp.asarray(_to_np(sd[f"{prefix}.conv.bias"])),
        "scale": jnp.asarray(_to_np(sd[f"{prefix}.adn.N.weight"])),
        "bias": jnp.asarray(_to_np(sd[f"{prefix}.adn.N.bias"])),
    }


def torch_state_dict_to_params(state_dict: dict) -> dict:
    """Map a MONAI BasicUNet state_dict (torch tensors or numpy) to params."""
    sd = {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }

    def two_conv(prefix: str) -> dict:
        return {
            "conv_0": _conv_block_from(sd, f"{prefix}.conv_0"),
            "conv_1": _conv_block_from(sd, f"{prefix}.conv_1"),
        }

    params = {"conv_0": two_conv("conv_0")}
    for k in (1, 2, 3, 4):
        params[f"down_{k}"] = two_conv(f"down_{k}.convs")
    for k in (4, 3, 2, 1):
        p = two_conv(f"upcat_{k}.convs")
        p["deconv_w"] = jnp.asarray(_to_np(sd[f"upcat_{k}.upsample.deconv.weight"]))
        p["deconv_b"] = jnp.asarray(_to_np(sd[f"upcat_{k}.upsample.deconv.bias"]))
        params[f"upcat_{k}"] = p
    fw = _to_np(sd["final_conv.weight"])  # (O, I, 1, 1, 1)
    params["final"] = {
        "w": jnp.asarray(np.transpose(fw, (2, 3, 4, 1, 0))),
        "b": jnp.asarray(_to_np(sd["final_conv.bias"])),
    }
    return params


def save_params_npz(path: str, params: dict) -> None:
    """Save a param pytree as .npz (framework-native weight format)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk("", params)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> dict:
    """Load a .npz saved by ``save_params_npz`` back into the nested pytree."""
    params: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return params


def load_weights(path: str) -> dict:
    """Load UNet weights from either the framework .npz format or the
    reference's torch .tar checkpoint (auto-detected by extension)."""
    if path.endswith(".npz"):
        return load_params_npz(path)
    return load_torch_checkpoint(path)


def load_torch_checkpoint(path: str) -> dict:
    """Load the reference's .tar checkpoint and return the JAX param pytree.

    Accepts the ``state_dict`` key (reference: inference/inference.py:222),
    the legacy ``model_state`` key (inference/inference_nifti_load.py:215),
    or a bare state_dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return torch_state_dict_to_params(ckpt)
