"""Submission input-pipeline parity against the ACTUAL reference
``ESAValDataSet`` (data_load_val.py).

Loads ``data_load_val.py`` from the reference checkout, feeds it a
synthetic SPEED-layout fixture (grayscale 1920x1200 PNGs under ``test/``
and ``real_test/`` + val pickles), runs real ``__getitem__`` calls, and
compares every output against our batched device-side pipeline:

* adjusted crop box   vs ``ops.crop.adjust_bbox_val`` (data_load_val.py:125-157
                      — the data_load4 rule WITHOUT square-equalization;
                      that step is commented out at :136-137)
* ``rate``            vs ``out_size / size``          (data_load_val.py:170-172)
* normalized pixels   vs crop_resize_from_boxes + normalize(mean=0.485)
                      (data_load_val.py:84-88,163-191)

The box list deliberately includes edge-of-frame boxes large enough that
the shift-back clamp (data_load_val.py:145-156) truncates the crop to a
NON-square window, exercising the reference's edge-pad call with its
swapped pad widths (``np.pad(image, ((0, size-xsize), (0, size-ysize)),
'edge')``, :168 — rows padded by the width deficit) which our sampler
reproduces exactly.

Environment shims as in test_reference_dataset_parity.py (torchvision
stub; none touch the math under test).  Skipped when the reference
checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import time

import numpy as np
import pytest

from tests.test_reference_dataset_parity import _install_torchvision_stub

REF_DIR = '/root/reference'
REF_PATH = os.path.join(REF_DIR, 'data_load_val.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')

SCALE = 128
# x1, y1, x2, y2:
#  - interior box (square stays square)
#  - right-edge box: shift-back without truncation
#  - tall box (size 575): height clamp truncates -> xsize > ysize,
#    swapped pad adds COLUMNS for the height deficit
#  - wide giant box (size 920): both axes clamp, xsize=1920 > ysize=1200
#  - top-left corner box: negative-origin clamp path
BBOXES = [
    (400, 300, 700, 520),
    (1700, 100, 1900, 350),
    (800, 25, 1100, 1175),
    (40, 400, 1880, 800),
    (5, 10, 180, 200),
]


@pytest.fixture(scope='module')
def ref_dataset(tmp_path_factory):
    """Builds the fixture tree and os.chdir()s into it for the module's
    lifetime (the reference dataset opens ``data/val.pkl`` and
    ``data/real_val.pkl`` relative to the cwd) — tests added to this file
    must not rely on repo-relative paths."""
    from PIL import Image

    tmp = tmp_path_factory.mktemp('esa_val_fixture')
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:1200, 0:1920]
    frame = (90 + 55 * np.sin(xx / 83.0) + 45 * np.cos(yy / 61.0)
             + rng.uniform(0, 40, size=(1200, 1920)))
    frame = np.clip(frame, 0, 255).astype(np.uint8)
    for sub in ('test', 'real_test'):
        (tmp / 'images' / sub).mkdir(parents=True)
        Image.fromarray(frame, mode='L').save(
            tmp / 'images' / sub / 'img000001.png')

    records = []
    for bbox in BBOXES:
        records.append({
            'rgb_pth': 'img000001.png',
            'bbox': list(bbox),
            'sift3d': rng.normal(size=(30, 3)),
            'K': np.eye(3),
        })
    (tmp / 'data').mkdir()
    for name in ('val.pkl', 'real_val.pkl'):
        with open(tmp / 'data' / name, 'wb') as f:
            pickle.dump(records, f)

    stubs = _install_torchvision_stub()
    had_clock = hasattr(time, 'clock')
    if not had_clock:
        time.clock = time.perf_counter   # removed in py3.8; used at :213
    sys.path.insert(0, REF_DIR)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        spec = importlib.util.spec_from_file_location('ref_data_load_val',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ds_test = mod.ESAValDataSet(root=str(tmp / 'images') + '/',
                                    real=False, scale=SCALE, gauss_size=2)
        ds_real = mod.ESAValDataSet(root=str(tmp / 'images') + '/',
                                    real=True, scale=SCALE, gauss_size=2)
        yield ds_test, ds_real, records, frame
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_DIR)
        for name in stubs:
            sys.modules.pop(name, None)
        if not had_clock:
            del time.clock


@pytest.fixture(scope='module')
def ours(ref_dataset):
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.ops import crop as crop_ops

    _, _, records, frame = ref_dataset
    frames = jnp.asarray(np.stack([frame] * len(records)).astype(np.float32))
    bboxes = jnp.asarray(np.array(BBOXES, np.float32))
    origin, crop_sizes, size = crop_ops.adjust_bbox_val(bboxes)
    crops = crop_ops.crop_resize_from_boxes(frames, origin, crop_sizes,
                                            size, SCALE)
    rates = SCALE / size.astype(jnp.float32)
    image = crop_ops.normalize(crops, mean=0.485, std=0.229)
    return {
        'origin': np.asarray(origin), 'crop_sizes': np.asarray(crop_sizes),
        'rate': np.asarray(rates), 'image': np.asarray(image),
    }


def test_fixture_exercises_nonsquare_crops(ours):
    """The box list must actually hit the swapped-pad path."""
    cs = ours['crop_sizes']
    assert (cs[:, 0] != cs[:, 1]).sum() >= 2, cs


@pytest.mark.parametrize('real', [False, True])
@pytest.mark.parametrize('i', range(len(BBOXES)))
def test_item_matches_reference(ref_dataset, ours, i, real):
    ds_test, ds_real, _, _ = ref_dataset
    ds = ds_real if real else ds_test
    image, bbox, rate, _s3d, _K, img_name, _img = ds[i]

    x_new, y_new, w_new, h_new = bbox
    assert ours['origin'][i].tolist() == [x_new, y_new]
    assert ours['crop_sizes'][i].tolist() == [w_new - x_new, h_new - y_new]
    np.testing.assert_allclose(ours['rate'][i], rate, rtol=1e-6)
    assert img_name == 'img000001.png'

    # reference resizes uint8 with cv2's fixed-point bilinear; ours is
    # float MXU matmuls -> ~1.5 gray levels = 1.5/255/0.229 normalized
    np.testing.assert_allclose(ours['image'][i], image.numpy()[0],
                               atol=0.03)
