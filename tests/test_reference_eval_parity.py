"""Evaluation-core parity against the ACTUAL reference evaluation.py.

Loads the reference module from the checkout and compares, on shared
random poses/model points:

* ``eval.evaluator.add_error``            vs ``Evaluator.add_metric``     (evaluation.py:356-384)
* ``eval.evaluator.adds_error``           vs ``Evaluator.add_metric_sym`` (:386-397)
* ``eval.evaluator.projection_error_2d``  vs ``Evaluator.projection_2d``  (:340-345)
* ``eval.evaluator.cm_degree_error``      vs ``Evaluator.cm_degree_5_metric`` (:399-411)
* ``eval.evaluator.AverageMeter``         vs the reference AverageMeter   (:14-29)
* ``eval.projector.Projector`` intrinsics vs the reference table          (:172-190)

Environment shims (none touch the math): ``plyfile`` and the native cffi
``find_nearest_point_idx`` are absent from this image — stubbed with a
numpy NN (only consumed by the *_sym metrics, where the stub IS the
semantics: nearest-reference-point lookup).  ``Evaluator.__init__``
builds a mesh DB from hard disk paths, so instances are created with
``object.__new__`` and bare recorder lists.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = '/root/reference'
REF_PATH = os.path.join(REF_DIR, 'evaluation.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


def _nearest_idx(pts1, pts2):
    """numpy stand-in for the CUDA find_nearest_point_idx
    (src/nearest_neighborhood.cu:48-167): nearest pts1 index per pts2 row."""
    d = np.linalg.norm(pts1[:, None] - pts2[None], axis=-1)
    return np.argmin(d, axis=0)


@pytest.fixture(scope='module')
def ref():
    stubs = {}
    # plyfile: imported at :6, used only by LineModModelDB mesh loading
    ply = types.ModuleType('plyfile')
    ply.PlyData = object
    stubs['plyfile'] = ply
    # native extend_utils: find_nearest_point_idx only
    for name in ('lib', 'lib.utils', 'lib.utils.extend_utils'):
        stubs[name] = types.ModuleType(name)
    eu = types.ModuleType('lib.utils.extend_utils.extend_utils')
    eu.find_nearest_point_idx = _nearest_idx
    stubs['lib.utils.extend_utils.extend_utils'] = eu

    old = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_DIR)           # evaluation.py does `from pnp import pnp`
    try:
        spec = importlib.util.spec_from_file_location('ref_evaluation',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REF_DIR)
        for k, v in old.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _bare_evaluator(ref):
    ev = object.__new__(ref.Evaluator)
    for attr in ('projection_2d_recorder', 'add_recorder',
                 'cm_degree_5_recorder', 'proj_mean_diffs', 'add_dists',
                 'cm', 'degree', 'uncertainty_pnp_cost'):
        setattr(ev, attr, [])
    ev.projector = ref.Projector()
    return ev


@pytest.fixture(scope='module')
def poses():
    rng = np.random.default_rng(0)
    model = rng.uniform(-0.06, 0.06, size=(64, 3))
    K = np.array([[572.4114, 0., 325.2611],
                  [0., 573.57043, 242.04899],
                  [0., 0., 1.]])
    cases = []
    for i in range(4):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0, 0.08)
        Kmat = np.array([[0, -axis[2], axis[1]],
                         [axis[2], 0, -axis[0]],
                         [-axis[1], axis[0], 0]])
        R_gt = np.eye(3)
        dR = (np.eye(3) + np.sin(ang) * Kmat + (1 - np.cos(ang)) * Kmat @ Kmat)
        t_gt = np.array([0.02, -0.03, 0.5]) + rng.normal(0, 0.02, 3)
        t_pred = t_gt + rng.normal(0, 0.004, 3)
        pose_gt = np.hstack([R_gt, t_gt[:, None]])
        pose_pred = np.hstack([dR @ R_gt, t_pred[:, None]])
        cases.append((pose_pred, pose_gt))
    return model, K, cases


def test_add_metric_matches(ref, poses):
    from esa_pose_estimation_tpu.eval.evaluator import add_error
    model, K, cases = poses
    ev = _bare_evaluator(ref)
    diameter = 0.12
    got = []
    for pose_pred, pose_gt in cases:
        ev.add_metric(pose_pred, pose_gt, model, diameter)
        e = float(add_error(model, pose_pred[:, :3], pose_pred[:, 3],
                            pose_gt[:, :3], pose_gt[:, 3]))
        got.append(e)
    np.testing.assert_allclose(got, ev.add_dists, rtol=1e-5)
    assert [e < diameter * 0.1 for e in got] == ev.add_recorder


def test_add_sym_metric_matches(ref, poses):
    from esa_pose_estimation_tpu.eval.evaluator import adds_error
    model, K, cases = poses
    ev = _bare_evaluator(ref)
    diameter = 0.12
    for pose_pred, pose_gt in cases:
        ev.add_metric_sym(pose_pred, pose_gt, model, diameter)
        e = float(adds_error(model, pose_pred[:, :3], pose_pred[:, 3],
                             pose_gt[:, :3], pose_gt[:, 3]))
        # ours runs the NN reduction in f32
        np.testing.assert_allclose(e, ev.add_dists[-1], rtol=1e-3)


def test_projection_2d_matches(ref, poses):
    from esa_pose_estimation_tpu.eval.evaluator import projection_error_2d
    model, K, cases = poses
    ev = _bare_evaluator(ref)
    for pose_pred, pose_gt in cases:
        ev.projection_2d(pose_pred, pose_gt, model, K)
        e = float(projection_error_2d(model, K, pose_pred[:, :3],
                                      pose_pred[:, 3], pose_gt[:, :3],
                                      pose_gt[:, 3]))
        np.testing.assert_allclose(e, ev.proj_mean_diffs[-1], rtol=1e-4)


def test_cm_degree_matches(ref, poses):
    from esa_pose_estimation_tpu.eval.evaluator import cm_degree_error
    model, K, cases = poses
    ev = _bare_evaluator(ref)
    for pose_pred, pose_gt in cases:
        ev.cm_degree_5_metric(pose_pred, pose_gt)
        cm, deg = cm_degree_error(pose_pred[:, :3], pose_pred[:, 3],
                                  pose_gt[:, :3], pose_gt[:, 3])
        np.testing.assert_allclose(float(cm), ev.cm[-1], rtol=1e-4)
        np.testing.assert_allclose(float(deg), ev.degree[-1], rtol=1e-3)
        want_ok = ev.cm[-1] < 5 and ev.degree[-1] < 5
        assert (float(cm) < 5 and float(deg) < 5) == want_ok


def test_average_meter_matches(ref):
    from esa_pose_estimation_tpu.eval.evaluator import AverageMeter
    theirs, ours = ref.AverageMeter(), AverageMeter()
    rng = np.random.default_rng(3)
    for _ in range(10):
        v, n = float(rng.uniform()), int(rng.integers(1, 5))
        theirs.update(v, n)
        ours.update(v, n)
    assert ours.avg == pytest.approx(theirs.avg)
    assert ours.sum == pytest.approx(theirs.sum)
    assert ours.count == theirs.count


def test_projector_intrinsics_match(ref):
    from esa_pose_estimation_tpu.eval.projector import Projector
    theirs = ref.Projector.intrinsic_matrix
    proj = Projector()
    for name in ('linemod', 'blender'):
        np.testing.assert_allclose(np.asarray(proj.intrinsics(name)),
                                   theirs[name], rtol=1e-6)


def test_projection_matches_reference_project_K(ref, poses):
    from esa_pose_estimation_tpu.eval.projector import Projector
    model, K, cases = poses
    proj = Projector()
    theirs = ref.Projector()
    from esa_pose_estimation_tpu.eval.projector import register_camera
    register_camera('_t', K)
    for pose_pred, _ in cases:
        want = theirs.project_K(model, pose_pred, K)
        got = proj.project(model, pose_pred, '_t')
        np.testing.assert_allclose(got, want, atol=1e-3)
