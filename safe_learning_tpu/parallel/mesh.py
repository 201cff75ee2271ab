"""Device-mesh helpers for grid-sharded verification.

The reference has no distributed layer at all (SURVEY.md section 2:
"Parallelism audit" — its only concurrency is TF1 thread pools). The
TPU-native scale axis is the state grid (10^6-10^7 points): points are
sharded across devices over a 1-D ``grid`` mesh axis; the decrease check is
embarrassingly parallel per point and the certified level ``c_max`` is a
single global reduction, so collectives ride the ICI and the programming
model stays a plain ``jit`` with sharding annotations.

For model-parallel layouts (large PWL parameter tables), a second ``model``
axis shards the vertex-value table; XLA turns the barycentric gathers into
collective lookups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "grid_sharding", "replicated_sharding",
           "shard_points", "sharded_safe_set_update"]


def make_mesh(n_devices=None, axis_names=("grid",), shape=None):
    """Create a device mesh.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (defaults to all).
    axis_names : tuple of str
        Mesh axis names; default a single ``grid`` axis for grid-sharded
        data parallelism.
    shape : tuple of int, optional
        Mesh shape; defaults to all devices on the first axis.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def grid_sharding(mesh, ndim=2, axis=None):
    """Sharding that splits the leading (grid-point) axis across devices."""
    axis = mesh.axis_names[0] if axis is None else axis
    spec = PartitionSpec(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    """Fully replicated sharding."""
    return NamedSharding(mesh, PartitionSpec())


def shard_points(points, mesh, axis=None):
    """Place a (N, d) point batch sharded over the mesh's grid axis."""
    points = jnp.asarray(points)
    return jax.device_put(points, grid_sharding(mesh, points.ndim, axis))


def sharded_safe_set_update(lyapunov, mesh, can_shrink=True, **kwargs):
    """Run ``lyapunov.update_safe_set`` SPMD over the mesh.

    Temporarily installs the mesh on the Lyapunov object. Non-adaptive
    verifications take the fused whole-grid device path; adaptive ones
    (or explicit ``max_refinement``/``batch_size`` kwargs) go through
    ``update_safe_set``, whose main and refinement batches are sharded
    over the mesh's grid axis.
    """
    old_mesh = lyapunov.mesh
    lyapunov.mesh = mesh
    try:
        if lyapunov.adaptive or kwargs:
            lyapunov.update_safe_set(can_shrink=can_shrink, **kwargs)
        else:
            lyapunov._update_safe_set_fused(can_shrink)
    finally:
        lyapunov.mesh = old_mesh
    return lyapunov.safe_set, lyapunov.c_max
