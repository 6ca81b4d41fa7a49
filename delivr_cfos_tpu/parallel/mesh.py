"""Device-mesh helpers.

The reference's only device parallelism is single-node
``torch.nn.DataParallel`` (reference: inference/inference.py:217-219). Here
the distributed backend is JAX collectives over a ``jax.sharding.Mesh``:
spatial ('sp') sharding with halo exchange over ICI for one volume, data
('dp') sharding across brains/windows, weights replicated.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def maybe_initialize_distributed(env: dict | None = None) -> bool:
    """Call ``jax.distributed.initialize()`` when a multi-host TPU pod
    launch is detected — the runtime hook behind ``deploy/launch_pod.sh``
    (SURVEY.md §5.8; the reference has no multi-node path at all).

    Detection, in order:
    - ``DELIVR_DISTRIBUTED=0`` disables unconditionally;
    - ``DELIVR_DISTRIBUTED=1`` forces initialize() with JAX's automatic
      TPU-environment discovery;
    - ``DELIVR_COORDINATOR`` (+ ``DELIVR_NUM_PROCESSES``/
      ``DELIVR_PROCESS_ID``) configures an explicit coordinator, for
      clusters without TPU metadata discovery;
    - TPU pod env vars (``TPU_WORKER_HOSTNAMES``/``MEGASCALE_COORDINATOR_ADDRESS``
      with more than one worker) trigger automatic initialization.

    Returns True when initialize() was called. Idempotent: a second call
    (or an already-initialized backend) is a no-op returning False.
    """
    e = os.environ if env is None else env
    flag = e.get("DELIVR_DISTRIBUTED", "").strip()
    if flag == "0":
        return False
    if jax.distributed.is_initialized():
        return False

    kwargs = {}
    coord = e.get("DELIVR_COORDINATOR", "").strip()
    if coord:
        kwargs = {
            "coordinator_address": coord,
            "num_processes": int(e.get("DELIVR_NUM_PROCESSES", "1")),
            "process_id": int(e.get("DELIVR_PROCESS_ID", "0")),
        }
    elif flag != "1":
        # automatic detection: only initialize when the TPU runtime
        # advertises a multi-worker pod slice
        hostnames = e.get("TPU_WORKER_HOSTNAMES", "")
        mega = e.get("MEGASCALE_COORDINATOR_ADDRESS", "")
        if not mega and len([h for h in hostnames.split(",") if h]) <= 1:
            return False
    jax.distributed.initialize(**kwargs)
    return True


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


def make_hybrid_mesh(
    dcn_axis: str = "dp", ici_axis: str = "sp", n_slices: int | None = None
) -> Mesh:
    """Multi-slice / multi-host mesh: the DCN-connected axis is OUTERMOST
    (slow collectives ride the data-center network; fast ones ride ICI).

    The pipeline's layout (SURVEY.md §5.8): per-brain batch parallelism
    ('dp') maps across slices over DCN — brains are independent, so DCN only
    carries per-brain scalars — while per-volume spatial sharding ('sp')
    stays inside a slice on ICI, where the halo exchanges live. Call
    ``jax.distributed.initialize()`` before this on multi-host deployments.

    Falls back to a flat single-slice mesh when the platform exposes no
    slice topology (e.g. CPU test meshes).
    """
    devices = jax.devices()
    explicit = n_slices is not None
    try:
        from jax.experimental import mesh_utils

        if n_slices is None:
            n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        if n_slices > 1:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, len(devices) // n_slices),
                (n_slices, 1),
                devices=devices,
            )
            return Mesh(dev_array, (dcn_axis, ici_axis))
    except Exception:
        # no physical slice topology (virtual CPU meshes): honor an
        # EXPLICIT n_slices with a logical reshape — collective placement
        # is identical, only the physical DCN/ICI distinction is absent
        if explicit and n_slices and n_slices > 1 and len(devices) % n_slices == 0:
            dev_array = np.asarray(devices).reshape(n_slices, -1)
            return Mesh(dev_array, (dcn_axis, ici_axis))
    dev_array = np.asarray(devices).reshape(1, len(devices))
    return Mesh(dev_array, (dcn_axis, ici_axis))


def slice_submeshes(mesh: Mesh, ici_axis: str = "sp") -> list:
    """One single-axis ICI mesh per DCN slice of a hybrid mesh.

    Brains are independent (SURVEY.md §5.8): the runner maps the brain loop
    across these submeshes, so each brain's halo exchanges ride one slice's
    ICI and nothing hot ever crosses DCN."""
    devs = np.asarray(mesh.devices)
    if devs.ndim == 1:
        devs = devs[None]
    return [Mesh(devs[i], (ici_axis,)) for i in range(devs.shape[0])]


def assign_brains_to_slices(n_brains: int, n_slices: int) -> list:
    """Round-robin brain→slice assignment: returns per-slice index lists.
    On multi-host deployments each host runs the runner and processes only
    the slice matching ``jax.process_index()``; single-process virtual
    meshes iterate all slices."""
    out = [[] for _ in range(n_slices)]
    for i in range(n_brains):
        out[i % n_slices].append(i)
    return out
