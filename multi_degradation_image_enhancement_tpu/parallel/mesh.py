"""Device mesh + sharding rules: the framework's scale-out layer.

The reference is strictly single-process/single-device (SURVEY.md §2,
"Parallelism: explicit absence inventory") — its only concurrency is
DataLoader workers.  Here scale-out is first-class and TPU-native:

  * a ``jax.sharding.Mesh`` over ICI with named axes — ``data`` (batch /
    data-parallel) and ``spatial`` (image-height sharding, the
    sequence-parallel analog for a fully-convolutional workload);
  * shardings are *annotations*: the train step stays the pure function from
    ``engine.model.make_train_step``; under jit, XLA's SPMD partitioner
    inserts the gradient all-reduce, conv halo exchanges for spatially
    sharded convs, and global (sync) BatchNorm reductions automatically;
  * no NCCL/MPI analog exists or is needed — collectives are compiled.

Mesh config (``train.mesh`` in a task config): ``{"data": -1}`` uses every
device on the data axis; ``{"data": 4, "spatial": 2}`` is an 8-chip 2-D
layout.  Axis size ``-1`` means "all remaining devices".
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a named mesh. ``axes`` maps axis name → size (-1 = fill)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {DATA_AXIS: n}
    axes = dict(axes)

    fill_axes = [k for k, v in axes.items() if v == -1]
    fixed = int(np.prod([v for v in axes.values() if v != -1])) if axes else 1
    if fill_axes:
        if len(fill_axes) > 1:
            raise ValueError("Only one mesh axis may be -1")
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {axes}")
        axes[fill_axes[0]] = n // fixed
    total = int(np.prod(list(axes.values())))
    if total != n:
        raise ValueError(f"Mesh {axes} wants {total} devices, have {n}")

    mesh_devices = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(mesh_devices, tuple(axes.keys()))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for an NHWC image batch on this mesh.

    Batch dim shards over ``data``; the H dim shards over ``spatial`` when
    that axis exists (XLA handles conv halos).
    """
    spatial = SPATIAL_AXIS if SPATIAL_AXIS in mesh.axis_names else None
    return P(DATA_AXIS, spatial)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh with data(+spatial) sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def shard_train_step(step_fn, mesh: Mesh):
    """Compile a train step for the mesh: state replicated, batch sharded.

    Gradients are computed on local shards; XLA inserts the ``psum`` over
    ``data`` (and ``spatial``) because the loss reduces over sharded axes.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    msh = NamedSharding(mesh, P(DATA_AXIS))  # [B] validity mask, batch-sharded
    jit4 = jax.jit(
        step_fn,
        in_shardings=(rep, bsh, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    jit5 = jax.jit(
        step_fn,
        in_shardings=(rep, bsh, bsh, rep, msh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    def call(state, inputs, targets, dropout_key, mask=None):
        if mask is None:
            return jit4(state, inputs, targets, dropout_key)
        return jit5(state, inputs, targets, dropout_key, mask)

    # expose the underlying jits for AOT compile-then-execute flows (the
    # multi-host dryrun compiles explicitly, barriers across processes,
    # then runs the Compiled object — execution starts stay aligned even
    # when per-process compile times differ by minutes)
    call._jits = (jit4, jit5)
    return call


def shard_scan_train_step(chunk_fn, mesh: Mesh):
    """Compile a scan-chunk train step (``engine._build_scan_train_step``'s
    ``chunk_fn``) for the mesh.

    The xs are stacked on a leading chunk axis — sequential time, never
    sharded; each step's batch shards over ``data`` (+``spatial`` on H)
    exactly like the host-loop path, so scan-chunk × mesh composes: the
    device-side loop keeps epoch time pure device time AND every step runs
    SPMD with compiled gradient all-reduces.
    xs = (inputs[K,B,H,W,C], targets[K,B,H,W,C], keys[K], masks[K,B],
    valid[K]).
    """
    rep = replicated(mesh)
    spatial = SPATIAL_AXIS if SPATIAL_AXIS in mesh.axis_names else None
    xsh = NamedSharding(mesh, P(None, DATA_AXIS, spatial))
    msh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(
        chunk_fn,
        in_shardings=(rep, (xsh, xsh, rep, msh, rep)),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_eval_step(step_fn, mesh: Mesh):
    """Compile an eval step: params/stats replicated, batch sharded, outputs sharded."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, rep, bsh), out_shardings=bsh)
