"""Profiling utilities tests."""

import numpy as np

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.obs import profiling


def test_timer_spans():
    t = profiling.Timer()
    with t.span():
        x = jnp.ones((8, 8)).sum()
    with t.span(result=x):
        pass
    assert len(t.times) == 2
    assert t.total >= t.mean


def test_model_summary_counts():
    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.utils import config as cfg_mod
    s = profiling.model_summary(HRNet(cfg_mod.hrnet_tiny()), (1, 32, 32, 1))
    assert s['total_params'] > 1000
    assert sum(s['per_module'].values()) == s['total_params']


def test_precision_recall():
    m = profiling.MultiClassPrecisionRecall(3)
    m.update(np.array([0, 1, 2, 1]), np.array([0, 1, 1, 1]))
    p = m.precision()
    r = m.recall()
    assert p[0] == 1.0 and r[0] == 1.0
    assert p[1] == 1.0 and r[1] == 2.0 / 3.0
    assert p[2] == 0.0


def test_span_holder_syncs_inside_result():
    # The natural usage: compute INSIDE the span, sync at exit.
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.obs import profiling
    t = profiling.Timer()
    with t.span() as s:
        s.result = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert len(t.times) == 1 and t.times[0] > 0
