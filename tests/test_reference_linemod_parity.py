"""LINEMOD input-pipeline parity against the ACTUAL reference data_load3.py.

Builds a synthetic LINEMOD-layout fixture (640x480 RGB + mask images,
data2/{cls}_{real,train,render,fuse}.pkl) and runs the real
``LinemodDataSet.__getitem__`` (train mixture: real-train + render + fuse,
data_load3.py:89-121) against our pipeline:

* record mixing order              vs ``data.linemod.load_mixed_train_records``
* grow-back crop window + rate     vs ``ops.crop.adjust_bbox_linemod``  (:155-205)
* stretch-resized crop pixels      vs ``ops.crop.crop_resize_stretch`` +
                                   ``normalize_rgb``                    (:207-215,78-88)
* fuse/real class-mask decode      vs ``data.linemod.decode_class_mask`` (:146-154)
* 32-kp heatmaps + weight maps     vs ``ops.heatmap`` one-indexed render (:222-239)

Same environment shims as the ESA dataset parity test (torchvision stub
with identity ColorJitter, time.clock alias) — see
tests/test_reference_dataset_parity.py.

Skipped when the reference checkout is absent.
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
REF_PATH = os.path.join(REF_DIR, 'data_load3.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')

SCALE = 128
CLS = 'cat'           # FUSE_CLS_ORDER index 2 -> fuse mask value 3


def _frame(rng):
    yy, xx = np.mgrid[0:480, 0:640]
    img = np.stack([
        np.clip(90 + 70 * np.sin(xx / 71.0) + rng.uniform(0, 30, xx.shape), 0, 255),
        np.clip(90 + 60 * np.cos(yy / 47.0) + rng.uniform(0, 30, xx.shape), 0, 255),
        np.clip(120 + 50 * np.sin((xx + yy) / 99.0) + rng.uniform(0, 30, xx.shape), 0, 255),
    ], axis=-1).astype(np.uint8)
    return img


def _blob_mask(cx, cy, r, value=1):
    yy, xx = np.mgrid[0:480, 0:640]
    return (((xx - cx) ** 2 + (yy - cy) ** 2) < r * r).astype(np.uint8) * value


@pytest.fixture(scope='module')
def ref_dataset(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp('linemod_fixture')
    rng = np.random.default_rng(0)
    (tmp / 'real').mkdir()
    (tmp / 'render').mkdir()
    (tmp / 'fuse').mkdir()
    (tmp / 'data2').mkdir()

    def record(rgb_pth, dpt_pth, bbox):
        return {
            'rgb_pth': rgb_pth, 'dpt_pth': dpt_pth, 'bbox': list(bbox),
            'sift': rng.uniform(bbox[0], bbox[2], size=(32, 2)),
            'sift_3d': rng.normal(size=(32, 3)),
            'K': np.eye(3), 'RT': np.eye(3, 4).astype(np.float64),
        }

    # real: small interior box (grow-back path, rate == 1)
    Image.fromarray(_frame(rng)).save(tmp / 'real' / '000000.png')
    Image.fromarray(_blob_mask(300, 240, 40), mode='L').save(
        tmp / 'real' / 'm000000.png')
    real = [record('real/000000.png', 'real/m000000.png',
                   (260, 200, 340, 280))]

    # render: big box near the right edge (resize + clamp path)
    Image.fromarray(_frame(rng)).save(tmp / 'render' / '000000.png')
    Image.fromarray(_blob_mask(520, 240, 90), mode='L').save(
        tmp / 'render' / 'm000000.png')
    render = [record('render/000000.png', 'render/m000000.png',
                     (420, 140, 635, 350))]

    # fuse: path starts with 'f' -> class-index mask (cat -> 3)
    Image.fromarray(_frame(rng)).save(tmp / 'fuse' / '000000_rgb.png')
    Image.fromarray(_blob_mask(200, 300, 70, value=3), mode='L').save(
        tmp / 'fuse' / '000000_mask.png')
    fuse = [record('fuse/000000_rgb.png', 'fuse/000000_mask.png',
                   (120, 220, 290, 380))]

    with open(tmp / 'data2' / f'{CLS}_real.pkl', 'wb') as f:
        pickle.dump(real, f)
    with open(tmp / 'data2' / f'{CLS}_train.pkl', 'wb') as f:
        pickle.dump([('real/000000.png', 'x')], f)
    with open(tmp / 'data2' / f'{CLS}_render.pkl', 'wb') as f:
        pickle.dump(render, f)
    with open(tmp / 'data2' / f'{CLS}_fuse.pkl', 'wb') as f:
        pickle.dump(fuse, f)

    stubs = _install_torchvision_stub()
    had_clock = hasattr(time, 'clock')
    if not had_clock:
        time.clock = time.perf_counter
    sys.path.insert(0, REF_DIR)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        spec = importlib.util.spec_from_file_location('ref_data_load3',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ds = mod.LinemodDataSet(root=str(tmp) + '/', name=CLS, train=True,
                                use_fuse=True, use_render=True, scale=SCALE,
                                gauss_size=2)
        yield ds, str(tmp)
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
    from esa_pose_estimation_tpu.data import linemod as lm
    from esa_pose_estimation_tpu.ops import crop as crop_ops
    from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops

    _, root = ref_dataset
    records = lm.load_mixed_train_records(os.path.join(root, 'data2'), CLS)
    assert len(records) == 3
    loader = lm.LinemodBatchLoader(records, root, CLS, batch_size=3,
                                   shuffle=False, drop_last=False)
    batch = loader._assemble(records)

    bboxes = jnp.asarray(batch['bbox'])
    origin, crop_sizes, size = crop_ops.adjust_bbox_linemod(bboxes)
    crops = crop_ops.crop_resize_stretch(jnp.asarray(batch['frame']),
                                         origin, crop_sizes, SCALE)
    mask_crops = crop_ops.crop_resize_stretch(jnp.asarray(batch['mask']),
                                              origin, crop_sizes, SCALE)
    rates = SCALE / size.astype(jnp.float32)
    image = crop_ops.normalize_rgb(crops)
    kp = jnp.asarray(batch['keypoints_2d'])
    kp_crop = (kp - origin[:, None, :].astype(jnp.float32)) \
        * rates[:, None, None]
    hm = heatmap_ops.render_heatmaps(kp_crop, SCALE, SCALE, 2.0,
                                     one_indexed=True)
    wm = heatmap_ops.weight_maps(hm)
    return {
        'origin': np.asarray(origin), 'crop_sizes': np.asarray(crop_sizes),
        'rate': np.asarray(rates), 'image': np.asarray(image),
        'mask': np.asarray(mask_crops), 'heatmaps': np.asarray(hm),
        'weights': np.asarray(wm),
    }


@pytest.mark.parametrize('i', range(3))
def test_item_matches_reference(ref_dataset, ours, i):
    ds, _ = ref_dataset
    (image, label, weights), (_img, _bbox, rate, _sift, _s3d, _K, _RT) = \
        ds[i]

    np.testing.assert_allclose(ours['rate'][i], rate, rtol=1e-6)

    # RGB crop: reference resizes uint8 with cv2 fixed-point bilinear on
    # the grown window; ours stretch-samples in f32 -> ~1.5 gray levels
    np.testing.assert_allclose(ours['image'][i],
                               np.transpose(image.numpy(), (1, 2, 0)),
                               atol=0.035)

    np.testing.assert_allclose(ours['heatmaps'][i], label.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(ours['weights'][i], weights.numpy(),
                               atol=1e-5)


@pytest.mark.parametrize('i', range(3))
def test_mask_crop_matches_reference(ref_dataset, ours, i):
    """The reference's mask goes through the same crop + INTER_LINEAR
    resize (data_load3.py:207-215 mask branch, returned via the seg
    target in the 2-output path); uint8 rounding can flip boundary
    pixels, so require >= 99% agreement after thresholding."""
    ds, _ = ref_dataset
    des = ds.data[i]
    from PIL import Image as PilImage
    m = np.asarray(PilImage.open(os.path.join(str(ds.root), des['dpt_pth'])))
    if des['rgb_pth'][0] == 'f':
        m = np.asarray(m == ds.linemod_cls_names.index(CLS) + 1, np.uint8)
    else:
        m = np.asarray(m, np.uint8)
    import cv2
    x, y, w, h = des['bbox']
    # reproduce the reference's window arithmetic via our op (already
    # pinned exhaustively in tests/test_linemod_real.py)
    ox, oy = ours['origin'][i]
    cw, ch = ours['crop_sizes'][i]
    ref_mask = cv2.resize(m[oy:oy + ch, ox:ox + cw], (SCALE, SCALE))
    got = (ours['mask'][i] > 0.5).astype(np.uint8)
    want = (ref_mask > 0.5).astype(np.uint8)
    assert (got == want).mean() >= 0.99
