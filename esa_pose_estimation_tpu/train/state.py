"""Train state, optimizer schedule, and the sharded train/eval steps.

TPU-native re-design of the reference training driver internals
(reference: main.py:237-424): Adam with the stepped epoch schedule
(main.py:298-299 via adjust_learning_rate :223-234), the weighted
HeatmapWing loss (loss.py:116-129), and — instead of DataParallel
replicate/scatter/gather (main.py:254) — a single jitted SPMD step whose
batch axis is sharded over the device mesh.  BatchNorm statistics reduce
over the *global* batch automatically because the mean/var reductions cross
the sharded axis (XLA inserts the all-reduce), subsuming InPlaceABNSync.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from esa_pose_estimation_tpu.train.loss import weighted_heatmap_loss
from esa_pose_estimation_tpu.utils.config import TrainConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """Stepped schedule: lr_values[i] from epoch lr_boundaries[i-1]
    (reference: main.py:298-299 — absolute values, not decay factors).

    Duplicate boundaries (short runs rescale epochs and can collide, e.g.
    --epochs 2 -> boundaries (2, 2, 3)) COMPOSE their scales at the shared
    step instead of silently overwriting — every prescribed decade of
    decay is applied.  Mismatched value/boundary counts are an error, not
    a silent truncation.
    """
    if len(cfg.lr_values) != len(cfg.lr_boundaries) + 1:
        raise ValueError(
            f'need len(lr_values) == len(lr_boundaries) + 1, got '
            f'{len(cfg.lr_values)} values / {len(cfg.lr_boundaries)} '
            f'boundaries')
    boundaries_and_scales: dict[int, float] = {}
    prev = cfg.lr_values[0]
    for epoch, value in zip(cfg.lr_boundaries, cfg.lr_values[1:]):
        step = epoch * steps_per_epoch
        scale = value / prev
        boundaries_and_scales[step] = boundaries_and_scales.get(step,
                                                                1.0) * scale
        prev = value
    return optax.piecewise_constant_schedule(cfg.lr_values[0],
                                             boundaries_and_scales)


def create_train_state(model, cfg: TrainConfig, rng: jax.Array,
                       input_shape: tuple[int, ...],
                       steps_per_epoch: int = 1000) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape), train=False)
    tx = optax.adam(lr_schedule(cfg, steps_per_epoch))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        tx=tx,
    )


def train_step(state: TrainState, batch: dict[str, jnp.ndarray],
               loss_w: float = 10.0) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One SPMD optimization step.

    batch: {'image': (B, H, W, C), 'heatmaps': (B, H, W, K),
            'weights': (B, H, W, K)} — batch axis may be sharded over the
    mesh; gradients and BN statistics all-reduce automatically.
    """

    def loss_fn(params):
        out, mutated = state.apply_fn(
            {'params': params, 'batch_stats': state.batch_stats},
            batch['image'], train=True, mutable=['batch_stats'])
        loss = weighted_heatmap_loss(out, batch['heatmaps'],
                                     batch['weights'], W=loss_w)
        return loss, mutated

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=mutated['batch_stats'])
    metrics = {'loss': loss,
               'grad_norm': optax.global_norm(grads)}
    return state, metrics


def eval_step(state: TrainState, batch: dict[str, jnp.ndarray],
              loss_w: float = 10.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward + loss with frozen statistics.  Returns (heatmaps, loss)."""
    out = state.apply_fn(
        {'params': state.params, 'batch_stats': state.batch_stats},
        batch['image'], train=False)
    loss = weighted_heatmap_loss(out, batch['heatmaps'], batch['weights'],
                                 W=loss_w)
    return out, loss


def make_sharded_train_step(mesh, loss_w: float = 10.0,
                            state: TrainState | None = None) -> Callable:
    """jit the train step with explicit shardings: batch sharded on the
    'data' mesh axis; state replicated, or — when a ``state`` template is
    given and the mesh has a non-trivial 'model' axis — large kernels
    (and their Adam moments) sharded over 'model' via
    ``parallel.param_sharding`` (output-channel tensor parallelism on the
    dominant head convs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from esa_pose_estimation_tpu.parallel import param_sharding

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P('data'))
    st_sh = param_sharding(state, mesh) if state is not None else rep
    return jax.jit(
        partial(train_step, loss_w=loss_w),
        in_shardings=(st_sh, dat),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,),
    )


def make_sharded_scan_step(mesh, batch_fn: Callable, n_inner: int,
                           loss_w: float = 10.0,
                           state: TrainState | None = None) -> Callable:
    """jit a fused ``n_inner``-step train segment: on-device data
    generation + optimizer step under one ``lax.scan`` dispatch.

    Through a remote-TPU tunnel every dispatch pays a host round-trip;
    the per-step loop (one eager ``make_batch`` + one jitted step per
    iteration) was measured at ~1.9 s/step against a 57 ms/step device
    cost — ~97% dispatch overhead.  Scanning ``n_inner`` steps inside one
    jit removes it: one dispatch per log interval, and the host fetches
    only the (n_inner,) per-step loss vector.

    ``batch_fn(key) -> {'image', 'heatmaps', 'weights', ...}`` must be
    traceable (e.g. ``synthetic.make_batch``); the data stream is
    identical to the per-step loop because step ``base + j`` derives its
    key as ``fold_in(epoch_key, base + j)`` in both.

    Returns ``fn(state, epoch_key, base) -> (state, losses[n_inner])``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from esa_pose_estimation_tpu.parallel import param_sharding

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P('data'))
    st_sh = param_sharding(state, mesh) if state is not None else rep

    def run(state: TrainState, epoch_key: jax.Array, base: jnp.ndarray):
        def body(st, j):
            batch = batch_fn(jax.random.fold_in(epoch_key, base + j))
            batch = {k: jax.lax.with_sharding_constraint(batch[k], dat)
                     for k in ('image', 'heatmaps', 'weights')}
            st, metrics = train_step(st, batch, loss_w=loss_w)
            return st, metrics['loss']

        return jax.lax.scan(body, state, jnp.arange(n_inner))

    return jax.jit(run, in_shardings=(st_sh, rep, rep),
                   out_shardings=(st_sh, rep), donate_argnums=(0,))


def make_sharded_eval_step(mesh, loss_w: float = 10.0) -> Callable:
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P('data'))
    return jax.jit(
        partial(eval_step, loss_w=loss_w),
        in_shardings=(rep, dat),
        out_shardings=(dat, rep),
    )
