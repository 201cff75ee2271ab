"""Multi-process (multi-host) execution helpers.

``parallel/mesh.py`` covers single-process meshes (all devices visible
to one Python process — a TPU board). Crossing hosts (a pod slice over
DCN, or the multi-process CPU dryrun) needs three extra pieces, provided
here:

- :func:`initialize_distributed` — one-call wrapper around
  ``jax.distributed.initialize`` so every process joins the coordination
  service and ``jax.devices()`` becomes the GLOBAL device list;
- :func:`make_global_mesh` — a 1-D grid mesh over the global devices;
- :func:`global_grid_points` / :func:`global_array` — build globally
  sharded arrays where each process materializes only its addressable
  shards (``jax.make_array_from_callback``; a plain ``device_put`` of a
  host array cannot address remote devices);
- :func:`is_coordinator` — gate host-side state (checkpoints, prints,
  matplotlib) on process 0;
- :func:`sharded_decrease_check` / :func:`sharded_certified_level` —
  the verification sweep's two global programs over a multi-host mesh.

The verification sweep itself is unchanged: the decrease check is
per-point, the certified level is one global reduction, and XLA inserts
the cross-host collectives for the sharded ``jit`` program. See
``scripts/multiprocess_dryrun.py`` for the runnable multi-process CPU
check and ``docs/design.md`` for the DCN story.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["initialize_distributed", "make_global_mesh", "global_array",
           "global_grid_points", "is_coordinator", "fetch_global",
           "put_global", "broadcast_from_coordinator",
           "is_multiprocess_mesh",
           "sharded_decrease_check", "sharded_certified_level"]


def is_multiprocess_mesh(mesh):
    """Whether ``mesh`` spans devices of more than one process.

    Multi-process meshes need the callback/allgather data paths below
    (``put_global`` / ``fetch_global``) instead of plain ``device_put``
    / ``np.asarray``, which only address local devices.
    """
    if mesh is None:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def put_global(host_array, sharding):
    """Place a host-replicated array onto a (possibly global) sharding.

    Every process is expected to hold the SAME full ``host_array`` (the
    SPMD multi-host pattern: host logic replicated, device programs
    global); each process materializes only its addressable shards.
    Single-process shardings take the plain ``device_put`` fast path.
    """
    if not is_multiprocess_mesh(sharding.mesh):
        return jax.device_put(host_array, sharding)
    host_array = np.asarray(host_array)
    return jax.make_array_from_callback(host_array.shape, sharding,
                                        lambda idx: host_array[idx])


def broadcast_from_coordinator(tree):
    """Broadcast a host pytree from process 0 to every process.

    The multi-host form of "gate RNG-dependent host state on the
    coordinator": process 0's value wins everywhere (e.g. the chosen
    exploration samples and their measurements), so per-process RNG
    streams can never diverge the learned state. No-op single-process.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Join the JAX distributed runtime; return (process_id, count).

    All three arguments may be ``None`` on managed platforms (Cloud TPU
    pods auto-discover); for manual launches (e.g. the CPU dryrun) pass
    ``coordinator_address='host:port'``, ``num_processes`` and this
    process's ``process_id``. Safe to call once per process, BEFORE any
    other JAX API touches a backend.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return jax.process_index(), jax.process_count()


def is_coordinator():
    """Whether this is process 0 (gate host-side state on it)."""
    return jax.process_index() == 0


def make_global_mesh(axis_names=("grid",)):
    """A 1-D mesh over ALL devices of ALL processes."""
    devices = np.asarray(jax.devices())
    shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def global_array(shape, dtype, mesh, fill, spec=None):
    """Globally sharded array; each process fills only its shards.

    ``fill(index)`` receives the numpy-style index of one shard of the
    GLOBAL array and returns that shard's host data — called only for
    shards addressable by this process. Shards are cast to ``dtype`` so
    a fill callback whose natural dtype differs (e.g. float64 host grids
    in an x64 process feeding a float32 global array) cannot silently
    produce a mismatched global array; shards that already match pass
    through untouched, and device-resident shards are cast on device
    (no host round trip).
    """
    spec = PartitionSpec(mesh.axis_names[0]) if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    dtype = np.dtype(dtype)

    def _shard(index):
        shard = fill(index)
        if getattr(shard, "dtype", None) == dtype:
            return shard
        if isinstance(shard, jax.Array):
            return shard.astype(dtype)
        return np.asarray(shard, dtype=dtype)

    return jax.make_array_from_callback(tuple(shape), sharding, _shard)


def global_grid_points(grid, mesh):
    """The grid's points as a globally sharded ``(nindex, ndim)`` array.

    The grid is static host metadata replicated on every process, so
    each process computes its own shards locally — no host-to-host
    transfer of the (possibly multi-GB) point table.
    """
    points = grid.all_points
    spec = PartitionSpec(mesh.axis_names[0], None)
    return global_array(points.shape, points.dtype, mesh,
                        lambda index: points[index], spec=spec)


def fetch_global(array):
    """Gather a (possibly sharded) global array fully onto every host.

    Thin wrapper over ``multihost_utils.process_allgather`` that is a
    no-op ``np.asarray`` in single-process mode.
    """
    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        array, tiled=True))


def sharded_decrease_check(lyapunov, mesh):
    """Margin-guarded decrease booleans for the whole grid, SPMD.

    The multi-host form of the fused sweep's first stage: grid points
    sharded over the global mesh, one jitted program, XLA inserts the
    collectives. Returns ``(negative, values)`` as global arrays (use
    :func:`fetch_global` to materialize them on the hosts).
    """
    from ..lyapunov import _negative_batch, _values_batch

    # The sharded sweep is the same plain (config-dtype) pipeline as
    # update_safe_set: an extended-only (U_EFF) margin cannot cover it.
    lyapunov._require_f32_margin()
    points = global_grid_points(lyapunov.discretization, mesh)
    negative, _, _ = _negative_batch(
        lyapunov.policy, lyapunov.dynamics, lyapunov.lyapunov_function,
        lyapunov._lipschitz_lyapunov, lyapunov._lipschitz_dynamics,
        lyapunov.tau, points, lyapunov.certificate_margin)
    values = _values_batch(lyapunov.lyapunov_function, points)
    return negative, values


def sharded_certified_level(lyapunov, mesh, can_shrink=True):
    """Full multi-host certified-level update; returns (safe, c_max).

    Runs the fused update (decrease check + O(n) level reduction) on the
    globally sharded grid and materializes the resulting safe set on
    every host. ``lyapunov.safe_set`` / ``c_max`` are updated like
    ``update_safe_set(can_shrink=can_shrink)``. Every process must hold
    the same host-side safe-set state (the SPMD pattern; gate
    RNG-dependent updates on :func:`is_coordinator` and broadcast).
    """
    from ..lyapunov import _fused_update

    # Same unit guard as update_safe_set: refuse an extended-only
    # margin on the plain multi-host pipeline (advisor r3 finding #3).
    lyapunov._require_f32_margin()
    grid = lyapunov.discretization
    initial = (np.asarray(lyapunov.initial_safe_set)
               if lyapunov.initial_safe_set is not None
               else None)
    prev_safe = np.array(lyapunov.safe_set)
    exempt_mask = (initial.copy() if initial is not None
                   else np.zeros(grid.nindex, dtype=bool))
    if not can_shrink:
        exempt_mask |= prev_safe
    points = global_grid_points(grid, mesh)
    exempt = global_array((grid.nindex,), np.bool_, mesh,
                          lambda index: exempt_mask[index])
    safe_dev, c_max, values, any_safe = _fused_update(
        lyapunov.policy, lyapunov.dynamics, lyapunov.lyapunov_function,
        lyapunov._lipschitz_lyapunov, lyapunov._lipschitz_dynamics,
        lyapunov.tau, points, exempt, lyapunov.certificate_margin,
        lyapunov.level_margin, lyapunov._direct_grid_values())
    safe = np.array(fetch_global(safe_dev))  # writable host copy
    lyapunov.c_max = float(c_max) if bool(any_safe) else -np.inf
    lyapunov.values = fetch_global(values)
    # Refinement bookkeeping mirrors _update_safe_set_fused exactly so
    # the single-process and multi-host paths stay bit-for-bit
    # equivalent (including the checkpointed refinement levels):
    # fused-certified states are level 1; kept-but-not-recertified
    # states preserve their adaptive level (>= 1).
    refinement = np.where(safe, 1, 0)
    if not can_shrink:
        safe |= prev_safe
        keep = prev_safe & (refinement == 0)
        refinement[keep] = np.maximum(
            np.asarray(lyapunov._refinement)[keep], 1)
    if initial is not None:
        safe |= initial
        refinement[initial] = np.maximum(refinement[initial], 1)
    lyapunov.safe_set = safe
    lyapunov._refinement = refinement
    return safe, lyapunov.c_max
