"""Tracing / profiling utilities.

Replaces the reference's ad-hoc ``time.clock()`` spans and the hand-rolled
forward-hook FLOPs summarizer (reference: main.py:42-44 timing,
main.py:54-173 ``get_model_summary``) with:

* :class:`Timer` — wall-clock spans that block on device completion (JAX
  dispatch is async; un-synced timing measures nothing);
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace;
* :func:`model_summary` — parameter counts per top-level module plus the
  XLA-compiled FLOPs/bytes estimate from ``cost_analysis()`` (the compiler's
  own numbers, not a hook-based approximation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import numpy as np


class _Span:
    """Mutable handle yielded by :meth:`Timer.span`: assign the value to
    sync on to ``.result`` from inside the span."""

    __slots__ = ('result',)

    def __init__(self, result=None):
        self.result = result


class Timer:
    """Synchronized wall-clock span collector.

    Usage::

        with t.span() as s:
            s.result = jitted_step(x)   # blocked on at span exit

    Assigning the output inside the span is essential: JAX dispatch is
    async, so without the sync the span records only dispatch time.  The
    ``result=`` argument still works for values that already exist at
    entry (e.g. timing only the block_until_ready of in-flight work).
    """

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def span(self, result=None):
        s = _Span(result)
        start = time.perf_counter()
        try:
            yield s
        finally:
            if s.result is not None:
                jax.block_until_ready(s.result)
            self.times.append(time.perf_counter() - start)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def total(self) -> float:
        return float(np.sum(self.times))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def param_count(params: Any) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def model_summary(model, input_shape: tuple[int, ...],
                  train: bool = False) -> dict[str, Any]:
    """Parameter and compiled-cost summary (get_model_summary parity)."""
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init(rng, jnp.zeros(input_shape), train=train))
    per_module = {
        name: int(sum(np.prod(p.shape) for p in jax.tree.leaves(sub)))
        for name, sub in variables['params'].items()
    }
    total = sum(per_module.values())

    flops = bytes_accessed = None
    try:
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        ).lower(variables, jnp.zeros(input_shape))
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = cost.get('flops')
            bytes_accessed = cost.get('bytes accessed')
    except Exception:
        pass
    return {'total_params': total, 'per_module': per_module,
            'flops': flops, 'bytes_accessed': bytes_accessed}


class MultiClassPrecisionRecall:
    """Per-class precision/recall accumulator (reference:
    lib/utils/net_utils.py:241-270)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.tp = np.zeros(self.num_classes)
        self.fp = np.zeros(self.num_classes)
        self.fn = np.zeros(self.num_classes)

    def update(self, pred: np.ndarray, target: np.ndarray):
        pred = np.asarray(pred).reshape(-1)
        target = np.asarray(target).reshape(-1)
        for c in range(self.num_classes):
            self.tp[c] += np.sum((pred == c) & (target == c))
            self.fp[c] += np.sum((pred == c) & (target != c))
            self.fn[c] += np.sum((pred != c) & (target == c))

    def precision(self) -> np.ndarray:
        return self.tp / np.maximum(self.tp + self.fp, 1)

    def recall(self) -> np.ndarray:
        return self.tp / np.maximum(self.tp + self.fn, 1)
