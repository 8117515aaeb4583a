"""Device mesh and sharding utilities.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
replicate/scatter/gather over local GPUs plus a Python-queue sync-BN
(reference: main.py:254, models/sync_bn/inplace_abn/bn.py:116-178; SURVEY
§2.a).  The TPU-native equivalent is one SPMD program over a
``jax.sharding.Mesh``: the batch axis is sharded over the ``data`` mesh
axis, parameters are replicated, and XLA inserts the all-reduces (gradient
sums and BatchNorm statistics) over ICI automatically — no custom
communication code.

A ``model`` axis is provisioned for intra-layer sharding of larger variants;
for these CNN workloads (HRNet-W32 ~9.6M params) it defaults to size 1 and
the design doc in SURVEY §5.7 records why sequence-style TP/PP is not
applicable.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: list[jax.Device] | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    The requested factorization must use EVERY given device: silently
    idling chips (len(devices) % n_model != 0) looks like a throughput
    regression, and an over-large n_model yields an empty mesh whose
    failure would only surface later as a cryptic GSPMD error.
    """
    devices = devices if devices is not None else jax.devices()
    if n_model < 1 or n_model > len(devices):
        raise ValueError(f'n_model={n_model} with {len(devices)} devices')
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f'{len(devices)} devices do not factor into n_model='
                f'{n_model} (pass n_data or a device subset explicitly)')
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        # under-subscription silently idles chips (the docstring's
        # "looks like a throughput regression" case) — an intentional
        # sub-mesh must pass the device subset explicitly
        raise ValueError(f'mesh {n_data}x{n_model} uses '
                         f'{n_data * n_model} of {len(devices)} devices; '
                         f'pass devices=... to use a subset deliberately')
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_sharding(tree: Any, mesh: Mesh,
                   min_shard_elems: int = 1 << 16) -> Any:
    """Per-leaf NamedShardings: large kernels sharded over the model axis.

    Output-channel (last-axis) tensor parallelism for any leaf with
    ``size >= min_shard_elems`` whose last axis divides the model-axis
    extent; everything else (biases, BN stats, small branch convs, step
    counters) is replicated.  On the flagship HRNet this shards the head
    convs (3x3x480x480, 73% of all FLOPs — QUALITY.md §3) so an
    ``n_model > 1`` mesh splits the dominant matmul across chips and XLA
    inserts the channel all-gather where the concat head needs it.  With
    ``n_model == 1`` every leaf is replicated and this is exactly the
    previous behavior.

    Works on any pytree (params, TrainState incl. Adam moments — the
    moments share their param's shape so they shard identically).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (n_model > 1 and hasattr(x, 'ndim') and x.ndim >= 2
                and x.size >= min_shard_elems
                and x.shape[-1] % n_model == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_state(tree: Any, mesh: Mesh,
                min_shard_elems: int = 1 << 16) -> Any:
    """Place a pytree onto the mesh per :func:`param_sharding`."""
    return jax.tree.map(jax.device_put, tree,
                        param_sharding(tree, mesh, min_shard_elems))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x: Any, sh: NamedSharding) -> Any:
    """device_put that also works when the mesh spans multiple hosts
    (each process holds the local block / a full replica respectively —
    see parallel/distributed.py:stage_global)."""
    if jax.process_count() > 1:
        if isinstance(x, jax.Array):
            # already global (e.g. a jitted producer's output): the
            # consuming jit's in_shardings performs any final relayout
            return x
        from esa_pose_estimation_tpu.parallel.distributed import stage_global
        return stage_global(np.asarray(x), sh)
    return jax.device_put(x, sh)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree onto the mesh with the batch axis sharded.

    In a multi-process run the given (per-host) batch becomes this
    host's block of the global batch.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, rep), tree)
