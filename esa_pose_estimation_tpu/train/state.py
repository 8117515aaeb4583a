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


def make_sharded_eval_step(mesh, loss_w: float = 10.0) -> Callable:
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P('data'))
    return jax.jit(
        partial(eval_step, loss_w=loss_w),
        in_shardings=(rep, dat),
        out_shardings=(dat, rep),
    )
