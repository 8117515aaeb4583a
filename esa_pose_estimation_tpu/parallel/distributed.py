"""Multi-host (multi-process) runtime support.

The reference tops out at single-process ``torch.nn.DataParallel``
(main.py:254); this module is the extension past it: N controller
processes — one per TPU host of a pod slice — each see their local chips,
``jax.distributed.initialize`` stitches them into one global device set,
and the SAME sharded train step (train/state.py) runs unchanged because
GSPMD addresses the global mesh.  DCN only carries the gradient
all-reduce fragments XLA schedules across hosts; ingest is coordination
free (each host streams a disjoint record slice).

Pieces:

* :func:`initialize` — ``jax.distributed.initialize`` from explicit args
  or the standard env vars; idempotent and a no-op for single process.
* :func:`local_slice` — host i's contiguous slice of a record list
  (the Python-loader counterpart of the native loader's
  ``process_id/process_count`` C++ subrange).
* :func:`stage_global` — assemble a process-local numpy batch into a
  global ``jax.Array`` for a (possibly multi-host) NamedSharding; falls
  back to plain ``device_put`` when every shard is addressable.

Verified by a real 2-process CPU-backend run in
tests/test_distributed.py (subprocess pair over a localhost
coordinator, Gloo collectives): per-host loaders -> global batch ->
sharded train step, loss stepwise-identical to the single-process run.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np

_joined = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-process runtime (no-op when single-process).

    Explicit args win; otherwise the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or a
    TPU-pod metadata autodetect apply, exactly as
    ``jax.distributed.initialize`` documents.  Call BEFORE any device
    query (jax.devices(), first op) — the backend is frozen on first
    use.
    """
    env_coord = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if coordinator is None and num_processes is None and env_coord is None:
        return  # single-process run: nothing to join
    # NOTE: must not touch jax.process_count()/jax.devices() here — a
    # device query initializes (and freezes) the backend, after which
    # jax.distributed.initialize is an error.  Idempotence comes from the
    # distributed service's own state instead.
    global _joined
    if _joined:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _joined = True


def local_slice(records: Sequence, process_id: int | None = None,
                process_count: int | None = None) -> Sequence:
    """Host ``process_id``'s contiguous slice of ``records``, balanced to
    within one record (same arithmetic as the native loader's C++
    subrange, so the two ingest paths partition identically)."""
    pid = jax.process_index() if process_id is None else process_id
    n_proc = jax.process_count() if process_count is None else process_count
    if not 0 <= pid < n_proc:
        raise ValueError(f'process_id {pid} outside process_count {n_proc}')
    n = len(records)
    return records[n * pid // n_proc: n * (pid + 1) // n_proc]


def stage_global(x: np.ndarray, sharding) -> jax.Array:
    """Process-local numpy -> global jax.Array for ``sharding``.

    Multi-process: ``jax.make_array_from_process_local_data`` assembles
    the hosts' local blocks into one global array (each host transfers
    only its addressable shards — for a batch-sharded spec the global
    batch is the concatenation of the per-host batches).  Single
    process: plain async ``device_put``.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Align all controller processes at ``name`` (coordination-service
    barrier; no-op single-process).

    Placed immediately before the training loop: XLA's CPU Gloo backend
    creates its communicator contexts on the FIRST collective launch
    with a hardcoded 30 s key-exchange deadline, so controllers must
    reach that first launch within 30 s of each other.  Setup work
    before the loop (checkpoint restore, loader open, state init) has
    unbounded cross-host variance; the barrier resets the clock so only
    the (identical, hence aligned) jit compiles remain between the
    processes and their first collective.  TPU pods have the same
    first-collective rendezvous pattern, so the alignment is correct
    there too, not just on the CPU test backend.
    """
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


_align_counter = 0


def compile_aligned(jitted, *example_args):
    """AOT-compile a sharded program on every controller, THEN barrier.

    Returns the compiled executable (multi-process) or ``jitted``
    unchanged (single-process, where no alignment is needed).

    Why: collective communicator setup has a bounded cross-process
    rendezvous — XLA-CPU's Gloo backend hardcodes a 30 s key-exchange
    deadline at context creation, and TPU pods have an analogous
    first-collective rendezvous.  A barrier placed BEFORE the first
    jitted call does not help when the compile itself is slow and
    unevenly scheduled (two controllers timesharing one core can finish
    minutes apart), because the communicator is created at the first
    collective *launch*, which follows the compile.  Splitting compile
    from launch fixes it structurally: ``lower().compile()`` builds the
    executable without launching anything, the barrier then aligns all
    controllers, and the first launch follows within milliseconds on
    every process — compile-time skew can no longer eat the rendezvous
    deadline.

    The caller must invoke this with the same program in the same order
    on every controller (barrier names are derived from a per-process
    counter) and keep using the returned executable — calling the
    original ``jitted`` again would recompile.  Inputs at call time must
    match ``example_args``'s shapes/dtypes/shardings (static-shape
    training loops satisfy this by construction).
    """
    if jax.process_count() == 1:
        return jitted
    global _align_counter
    _align_counter += 1
    compiled = jitted.lower(*example_args).compile()
    barrier(f'compile_aligned_{_align_counter}')
    return compiled


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint side effects."""
    return jax.process_index() == 0


def global_batch_size(per_process_batch: int) -> int:
    return per_process_batch * jax.process_count()
