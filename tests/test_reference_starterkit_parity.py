"""Starter-kit parity against the ACTUAL reference utils.py / submission.py.

* ``core.camera.SPEED_K``        vs ``Camera.K``              (utils.py:24-39)
* ``core.camera.quat_to_dcm``    vs ``quat2dcm``              (utils.py:68-95)
* ``core.camera.project_axes``   vs ``project``               (utils.py:98-120)
* ``data.speed.process_json_dataset`` vs the reference parser (utils.py:42-65)
* ``eval.submission.SubmissionWriter`` vs the starter-kit writer, compared
  byte-for-byte on the exported CSV (submission.py:6-52)

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import json
import os

import numpy as np
import pytest

REF_DIR = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, 'utils.py')),
    reason='reference checkout not available')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f'ref_{name}', os.path.join(REF_DIR, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_utils():
    return _load('utils')


@pytest.fixture(scope='module')
def quats():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(6, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_camera_matrix_matches(ref_utils):
    from esa_pose_estimation_tpu.core.camera import SPEED_K
    np.testing.assert_allclose(np.asarray(SPEED_K, np.float64),
                               ref_utils.Camera.K, rtol=1e-6)


def test_quat2dcm_matches(ref_utils, quats):
    from esa_pose_estimation_tpu.core.camera import quat_to_dcm
    for q in quats:
        want = ref_utils.quat2dcm(q)
        got = np.asarray(quat_to_dcm(q.astype(np.float32)))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_project_axes_matches(ref_utils, quats):
    from esa_pose_estimation_tpu.core.camera import project_axes
    rng = np.random.default_rng(1)
    for q in quats:
        r = rng.uniform([-1, -1, 4], [1, 1, 30])
        want_x, want_y = ref_utils.project(q, r)
        got = np.asarray(project_axes(q.astype(np.float32),
                                      r.astype(np.float32)))
        # ours returns rows (x[4], y[4]) like the reference's (x, y) pair
        np.testing.assert_allclose(got[0], want_x, rtol=1e-4)
        np.testing.assert_allclose(got[1], want_y, rtol=1e-4)


def test_process_json_dataset_matches(ref_utils, tmp_path):
    from esa_pose_estimation_tpu.data.speed import process_json_dataset
    train = [{'filename': f'img{i:06d}.jpg',
              'q_vbs2tango': [1.0, 0, 0, 0],
              'r_Vo2To_vbs_true': [0.1 * i, 0.0, 10.0]} for i in range(3)]
    test = [{'filename': f'img{i:06d}.jpg'} for i in range(3, 5)]
    real = [{'filename': f'real{i:06d}.jpg'} for i in range(2)]
    (tmp_path / 'train.json').write_text(json.dumps(train))
    (tmp_path / 'test.json').write_text(json.dumps(test))
    (tmp_path / 'real_test.json').write_text(json.dumps(real))

    want_parts, want_labels = ref_utils.process_json_dataset(str(tmp_path))
    got = process_json_dataset(str(tmp_path))
    assert got.partitions == want_parts
    assert set(got.labels) == set(want_labels)
    for k in want_labels:
        assert got.labels[k]['q'] == want_labels[k]['q']
        assert got.labels[k]['r'] == want_labels[k]['r']


def test_submission_csv_byte_identical(tmp_path):
    ref_sub = _load('submission')
    from esa_pose_estimation_tpu.eval.submission import SubmissionWriter

    rng = np.random.default_rng(2)
    entries = [(f'img{i:06d}.jpg', rng.normal(size=4).tolist(),
                rng.normal(size=3).tolist(), i % 2 == 0) for i in range(6)]

    theirs, ours = ref_sub.SubmissionWriter(), SubmissionWriter()
    for fn, q, r, real in entries:
        (theirs.append_real_test if real else theirs.append_test)(fn, q, r)
        (ours.append_real_test if real else ours.append_test)(fn, q, r)

    ref_dir = tmp_path / 'ref'
    our_dir = tmp_path / 'ours'
    ref_dir.mkdir()
    our_dir.mkdir()
    theirs.export(out_dir=str(ref_dir), suffix='x')
    ours.export(out_dir=str(our_dir), suffix='x')
    want = (ref_dir / 'submission_x.csv').read_bytes()
    got = (our_dir / 'submission_x.csv').read_bytes()
    assert got == want
