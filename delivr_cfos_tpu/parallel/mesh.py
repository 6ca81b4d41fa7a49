"""Device-mesh helpers.

The reference's only device parallelism is single-node
``torch.nn.DataParallel`` (reference: inference/inference.py:217-219). Here
the distributed backend is JAX collectives over a ``jax.sharding.Mesh``:
spatial ('sp') sharding with halo exchange over ICI for one volume, data
('dp') sharding across brains/windows, weights replicated.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Create a mesh from {axis_name: size}; defaults to all devices on a
    single 'sp' axis. Sizes must multiply to the device count used."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"sp": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, names)
