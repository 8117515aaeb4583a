"""TSV-logger interop against the ACTUAL reference logger.py.

The reference ``Logger`` (logger.py:22-98) writes a trailing tab after
every header name and value; ours writes clean tab-joined rows.  What
must hold for migration:

* our ``TsvLogger(resume=True)`` reads a reference-written file —
  names and numbers identical to what the reference itself re-reads;
* the reference ``Logger(resume=True)`` reads our file back with the
  same numbers (its parser splits on '\\t' and never hits the missing
  trailing tab).

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

REF_PATH = '/root/reference/logger.py'

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')

NAMES = ['epoch', 'loss', 'score_t']
ROWS = [[1.0, 0.071234, 0.51], [2.0, 0.032, 0.22], [3.0, 0.0111, 0.093]]


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location('ref_logger', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_resume_reads_reference_file(ref, tmp_path):
    from esa_pose_estimation_tpu.obs.logger import TsvLogger
    path = str(tmp_path / 'log_esa.txt')
    ref_logger = ref.Logger(path, title='esa')
    ref_logger.set_names(NAMES)
    for row in ROWS:
        ref_logger.append(row)
    ref_logger.close()

    ours = TsvLogger(path, resume=True)
    assert ours.names == NAMES
    for i, n in enumerate(NAMES):
        np.testing.assert_allclose(ours.numbers[n],
                                   [r[i] for r in ROWS], atol=1e-6)
    # appending after resume keeps the file parseable by the reference
    ours.append([4.0, 0.005, 0.04])
    ours.close()
    back = ref.Logger(path, title='esa', resume=True)
    assert back.names[:len(NAMES)] == NAMES
    assert len(back.numbers['loss']) == len(ROWS) + 1
    back.close()


def test_reference_resumes_our_file(ref, tmp_path):
    from esa_pose_estimation_tpu.obs.logger import TsvLogger
    path = str(tmp_path / 'ours.txt')
    ours = TsvLogger(path)
    ours.set_names(NAMES)
    for row in ROWS:
        ours.append(row)
    ours.close()

    theirs = ref.Logger(path, resume=True)
    assert theirs.names == NAMES
    for i, n in enumerate(NAMES):
        np.testing.assert_allclose([float(v) for v in theirs.numbers[n]],
                                   [r[i] for r in ROWS], atol=1e-6)
    theirs.close()
