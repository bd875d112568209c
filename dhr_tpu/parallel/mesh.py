"""Device mesh construction and sharding helpers.

One mesh abstraction serves both subsystems:

- training: batch sharded over the ``data`` axis, params replicated —
  the global in-batch-negative scores are computed under ``jit`` and XLA
  lowers the cross-device gathers onto ICI (replacing the reference's NCCL
  ``all_gather``, SURVEY.md section 2.11);
- retrieval: index rows sharded over the ``index`` axis; per-shard top-k is
  merged with an all-gather (replacing the reference's file-per-shard merge
  scripts).

For multi-host topologies, create the mesh with the DCN (host) axis leading
so that the inner, collective-heavy axis rides ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"
HOST_AXIS = "host"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def make_hybrid_mesh(
    devices=None,
    inner_axis: str = INDEX_AXIS,
    host_axis: str = HOST_AXIS,
    num_hosts: int | None = None,
) -> Mesh:
    """A 2-D ``(host, inner)`` mesh with the DCN axis LEADING.

    Multi-host topologies need the slow (DCN) axis outermost so that the
    collective-heavy inner axis stays on ICI (scaling-book multi-pod
    recipe; the reference has no equivalent — its multi-node story is
    process-per-shard files merged on disk).  Devices are grouped by
    ``process_index`` so each mesh row is one host's chips; row-sharding
    over ``(host, inner)`` then keeps every heavy collective intra-host and
    crosses DCN only for the tiny merged results.

    ``num_hosts`` overrides the process grouping (e.g. to rehearse a
    multi-host layout on a single-process 8-CPU-device mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_hosts is None:
        num_hosts = len({d.process_index for d in devices})
    if len(devices) % num_hosts:
        raise ValueError(
            f"{len(devices)} devices do not divide into {num_hosts} hosts"
        )
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    per_host = len(devices) // num_hosts
    arr = np.asarray(devices).reshape(num_hosts, per_host)
    # The whole point of this constructor is that each mesh row is ONE
    # host's chips (heavy collectives stay on ICI).  A filtered device list
    # with unequal per-host counts can pass the divisibility check yet make
    # rows silently span processes — reject that, unless the caller is
    # simulating hosts on a single process (num_hosts override there).
    n_procs = len({d.process_index for d in devices})
    if n_procs > 1:
        for row in arr:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                counts = {}
                for d in devices:
                    counts[d.process_index] = counts.get(d.process_index, 0) + 1
                raise ValueError(
                    f"devices do not group into {num_hosts} equal hosts: "
                    f"per-process counts {counts}; a mesh row would span "
                    f"processes, putting the inner axis on DCN"
                )
    return Mesh(arr, (host_axis, inner_axis))


def row_axes(mesh: Mesh | None, axis: str = INDEX_AXIS) -> tuple[str, ...]:
    """The mesh axes row-sharding should span: ``(outer, axis)`` on a 2-D
    hybrid mesh, else ``(axis,)``.  Outer-major order keeps shard ids
    contiguous per host, so per-shard row offsets map to host-local index
    slices.

    Any 2-D mesh containing ``axis`` counts as hybrid regardless of what
    the outer axis is called (``make_hybrid_mesh(host_axis=...)`` lets
    callers rename it), but ``axis`` must be the LAST (inner/ICI) mesh
    axis — a mesh ordered ``(index, host)`` would shard rows index-major
    and route the heavy stage-1 all-gather over the slow outer/DCN axis,
    so we reject it loudly instead of degrading silently; for >2-D meshes
    only the conventional :data:`HOST_AXIS` name is recognized."""
    if mesh is None or axis not in mesh.axis_names:
        return (axis,)
    if len(mesh.axis_names) == 2:
        if mesh.axis_names[-1] != axis:
            raise ValueError(
                f"hybrid mesh axes {mesh.axis_names} put {axis!r} on the "
                f"outer (DCN) axis; build the mesh (outer, {axis!r}) — e.g. "
                f"with make_hybrid_mesh — so heavy collectives stay on ICI"
            )
        return tuple(mesh.axis_names)  # (outer, inner) in mesh order
    if HOST_AXIS in mesh.axis_names:
        return (HOST_AXIS, axis)
    return (axis,)


def global_put(x, mesh: Mesh, spec: P):
    """``device_put`` that also works in MULTI-PROCESS SPMD.

    Single-process: a plain ``device_put``.  Multi-process (real multi-host
    runs and the two-process CPU validation,
    ``tools/two_process_check.py``): every process holds the identical full
    ``x`` and contributes its addressable shards of the global array via
    ``make_array_from_callback`` — a plain ``device_put`` of a host array
    cannot target non-addressable devices.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str | None = None) -> NamedSharding:
    """First-dim sharding over the mesh axis (batch rows / index rows)."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str | None = None):
    """Device-put a (nested) host batch with rows sharded over the mesh.

    On a hybrid mesh rows shard over the collapsed ``(outer, axis)`` axes
    (one global batch across hosts); works in multi-process SPMD too.
    """
    axes = row_axes(mesh, axis or mesh.axis_names[-1])
    return jax.tree.map(lambda x: global_put(x, mesh, P(axes)), batch)


def replicate(tree, mesh: Mesh):
    if jax.process_count() == 1:
        sharding = replicated(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: global_put(jax.device_get(x), mesh, P()), tree
    )


def pad_rows_to_multiple(array, multiple: int):
    """Pad leading dim to a device-count multiple; returns (padded, n_real).

    The encode path needs every batch to fill all mesh rows (the reference
    pads the final pmap batch the same way, driver/jax_encode.py:68-78).
    """
    n = array.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return array, n
    widths = [(0, pad)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(np.asarray(array), widths), n
