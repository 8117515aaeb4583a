"""Mixed-split parity against the ACTUAL reference ``data_load5.py``.

``data_load5.ESADataSet`` is the loader behind the reference's real-image
score (0.629): its train split is one pickle mixing synthetic-train and
real_test records, each routed to its image directory by filename length
(13 chars -> ``train/``, longer -> ``real_test/``, data_load5.py:110-113),
and pixels are normalized with ``mean=0.5`` instead of data_load4's 0.449
(data_load5.py:78-88).  The crop/heatmap math is identical to data_load4
(pinned exhaustively by test_reference_dataset_parity.py), so this test
pins exactly the two deltas against the real upstream module:

* per-record image routing — the two fixture frames have DIFFERENT pixel
  content, so a routing mistake shows up as a pixel mismatch, not just a
  path-string mismatch (``data.speed.mixed_image_path``);
* the 0.5/0.229 normalization (``build_batch(norm_mean=0.5)`` path).

Environment shims are the same as test_reference_dataset_parity.py and
touch none of the math under test.  Skipped when the reference checkout
is absent.
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import time

import numpy as np
import pytest

from test_reference_dataset_parity import _install_torchvision_stub

REF_DIR = '/root/reference'
REF_PATH = os.path.join(REF_DIR, 'data_load5.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')

SCALE = 128
SYN_NAME = 'img000001.jpg'            # 13 chars -> train/
REAL_NAME = 'img000001real.jpg'       # 17 chars -> real_test/
BBOX = (400, 300, 700, 520)


def _frame(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:1200, 0:1920]
    f = (80 + 60 * np.sin(xx / (90.0 + seed)) + 50 * np.cos(yy / 53.0)
         + rng.uniform(0, 40, size=(1200, 1920)))
    return np.clip(f, 0, 255).astype(np.uint8)


@pytest.fixture(scope='module')
def ref_dataset(tmp_path_factory):
    """Builds the fixture tree and os.chdir()s into it for the MODULE's
    lifetime (the reference dataset opens ``data/test.pkl`` relative to
    the cwd) — tests added to this file must not use repo-relative
    paths."""
    from PIL import Image

    tmp = tmp_path_factory.mktemp('esa5_fixture')
    frames = {SYN_NAME: _frame(1), REAL_NAME: _frame(7)}
    (tmp / 'images' / 'train').mkdir(parents=True)
    (tmp / 'images' / 'real_test').mkdir(parents=True)
    # PNG content under .jpg names: PIL routes on file signature, and
    # lossless pixels keep the comparison exact.
    Image.fromarray(frames[SYN_NAME], mode='L').save(
        tmp / 'images' / 'train' / SYN_NAME, format='PNG')
    Image.fromarray(frames[REAL_NAME], mode='L').save(
        tmp / 'images' / 'real_test' / REAL_NAME, format='PNG')

    rng = np.random.default_rng(0)
    records = []
    for name in (SYN_NAME, REAL_NAME):
        records.append({
            'rgb_pth': name,
            'bbox': list(BBOX),
            'sift': rng.uniform(BBOX[0], BBOX[2], size=(30, 2)),
            'sift3d': rng.normal(size=(30, 3)),
            'K': np.eye(3),
            'RT': np.eye(3, 4),
            'qua': np.array([1.0, 0, 0, 0]),
        })
    (tmp / 'data').mkdir()
    with open(tmp / 'data' / 'test.pkl', 'wb') as f:
        pickle.dump(records, f)

    stubs = _install_torchvision_stub()
    had_clock = hasattr(time, 'clock')
    if not had_clock:
        time.clock = time.perf_counter
    sys.path.insert(0, REF_DIR)
    cwd = os.getcwd()
    os.chdir(tmp)                        # the dataset opens data/test.pkl
    try:
        spec = importlib.util.spec_from_file_location('ref_data_load5',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ds = mod.ESADataSet(root=str(tmp / 'images') + '/', train=False,
                            scale=SCALE, gauss_size=2)
        yield ds, records, frames
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_DIR)
        for name in stubs:
            sys.modules.pop(name, None)
        if not had_clock:
            del time.clock


def test_mixed_path_rule_matches(ref_dataset, tmp_path):
    """mixed_image_path routes exactly like data_load5.py:110-113."""
    from esa_pose_estimation_tpu.data.speed import mixed_image_path

    assert mixed_image_path('/r', SYN_NAME) == os.path.join(
        '/r', 'train', SYN_NAME)
    assert mixed_image_path('/r', REAL_NAME) == os.path.join(
        '/r', 'real_test', REAL_NAME)
    # The reference tests len() on the FULL rgb_pth string, not the
    # basename: a 13-char basename under a directory prefix routes to
    # real_test/ there, and must here too.
    prefixed = os.path.join('sub', SYN_NAME)
    assert len(os.path.basename(prefixed)) == 13 and len(prefixed) != 13
    assert mixed_image_path('/r', prefixed) == os.path.join(
        '/r', 'real_test', prefixed)


@pytest.mark.parametrize('i', [0, 1])
def test_item_matches_reference(ref_dataset, i):
    """Pixels (routing + mean-0.5 normalize) match the upstream loader."""
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.data.speed import mixed_image_path
    from esa_pose_estimation_tpu.ops import crop as crop_ops

    ds, records, frames = ref_dataset
    (image, _label, _weights), (bbox, rate, *_rest) = ds[i]

    name = records[i]['rgb_pth']
    # our loader reads the frame the path rule selects
    routed = mixed_image_path('', name)
    assert os.path.basename(os.path.dirname(routed)) == (
        'train' if i == 0 else 'real_test')
    frame = frames[name].astype(np.float32)

    bboxes = jnp.asarray(np.array([BBOX], np.float32))
    origin, crop_sizes, size = crop_ops.adjust_bbox(bboxes)
    crops = crop_ops.crop_resize_from_boxes(
        frame[None], origin, crop_sizes, size, SCALE)
    ours = np.asarray(crop_ops.normalize(crops, mean=0.5, std=0.229))[0]

    # the same pixels must come out of the full build_batch(norm_mean=0.5)
    # path (pins the norm_mean plumbing through data/pipeline.py, which
    # the --mixed training CLI relies on)
    from esa_pose_estimation_tpu.data.pipeline import build_batch
    import jax
    kp = jnp.asarray(records[i]['sift'], jnp.float32)[None]
    built = build_batch(jnp.asarray(frame)[None], bboxes, kp,
                        jax.random.PRNGKey(0), crop_size=SCALE,
                        train=False, norm_mean=0.5)
    np.testing.assert_allclose(np.asarray(built['image'])[0, ..., 0],
                               ours, atol=1e-6)

    x_new, y_new, _, _ = bbox
    assert np.asarray(origin)[0].tolist() == [x_new, y_new]
    np.testing.assert_allclose(float(SCALE / np.asarray(size)[0]), rate,
                               rtol=1e-6)
    # same tolerance rationale as test_reference_dataset_parity: cv2's
    # fixed-point uint8 bilinear vs our float matmul resample
    np.testing.assert_allclose(ours, image.numpy()[0], atol=0.03)
    # a routing mistake would compare against the OTHER frame: assert the
    # two fixture frames are far apart at this crop so the check has teeth
    other = frames[REAL_NAME if i == 0 else SYN_NAME].astype(np.float32)
    crops_o = crop_ops.crop_resize_from_boxes(
        other[None], origin, crop_sizes, size, SCALE)
    wrong = np.asarray(crop_ops.normalize(crops_o, mean=0.5, std=0.229))[0]
    assert np.abs(wrong - image.numpy()[0]).max() > 0.2
