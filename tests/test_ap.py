"""average_precision tests vs sklearn-style manual computation."""

import numpy as np

import jax.numpy as jnp

from esa_pose_estimation_tpu.eval.evaluator import average_precision


def test_perfect_ranking():
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.2, 0.1])
    correct = jnp.asarray([True, True, True, False, False])
    assert float(average_precision(scores, correct)) == 1.0


def test_worst_ranking():
    scores = jnp.asarray([0.9, 0.8, 0.1])
    correct = jnp.asarray([False, False, True])
    np.testing.assert_allclose(float(average_precision(scores, correct)),
                               1.0 / 3.0, rtol=1e-6)


def test_interleaved():
    # hits at ranks 1 and 3: AP = (1/1 + 2/3) / 2
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    correct = jnp.asarray([True, False, True, False])
    np.testing.assert_allclose(float(average_precision(scores, correct)),
                               (1.0 + 2.0 / 3.0) / 2.0, rtol=1e-6)


def test_no_positives_is_zero():
    scores = jnp.asarray([0.9, 0.8])
    correct = jnp.asarray([False, False])
    assert float(average_precision(scores, correct)) == 0.0
