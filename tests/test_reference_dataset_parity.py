"""Input-pipeline parity against the ACTUAL reference ESADataSet.

Loads ``data_load4.py`` from the reference checkout, feeds it a synthetic
SPEED-layout fixture (grayscale 1920x1200 PNG + pickle records), and runs
real ``__getitem__`` calls, comparing every output against our batched
device-side pipeline:

* adjusted crop box            vs ``ops.crop.adjust_bbox``  (data_load4.py:110-146)
* ``rate``                     vs ``ops.crop.crop_resize``  (data_load4.py:153-155)
* normalized crop pixels       vs crop_resize + normalize   (data_load4.py:147-195)
* Gaussian heatmap targets     vs ``ops.heatmap.render_heatmaps(one_indexed=True)``
                               (CenterLabelHeatMap, data_load4.py:54-64,174-181)
* loss weight maps             vs ``ops.heatmap.weight_maps``

Environment shims (none touch the math under test): torchvision is absent
from this image, so a minimal ToTensor/Normalize/Compose stub is installed
(ColorJitter is train-only; we compare the deterministic eval transform);
``time.clock`` (removed in py3.8) is aliased to ``perf_counter``.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import time
import types

import numpy as np
import pytest

REF_DIR = '/root/reference'
REF_PATH = os.path.join(REF_DIR, 'data_load4.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')

SCALE = 128
# x1, y1, x2, y2 — interior, right-edge clamped (stays square),
# top-left corner (negative expansion, clamp + square-equalize path),
# and a tall giant box (size 575) whose height clamp truncates the crop
# NON-square, exercising the reference's swapped-axis edge pad
# (np.pad(image, ((0, size-xsize), (0, size-ysize))), data_load4.py:151)
BBOXES = [
    (400, 300, 700, 520),
    (1700, 100, 1900, 350),
    (5, 10, 180, 200),
    (800, 25, 1100, 1175),
]


def _install_torchvision_stub():
    import torch

    class ToTensor:
        def __call__(self, pil):
            arr = np.asarray(pil, dtype=np.float32) / 255.0
            if arr.ndim == 2:                      # grayscale -> (1, H, W)
                return torch.from_numpy(arr)[None]
            return torch.from_numpy(arr).permute(2, 0, 1)  # RGB -> (C, H, W)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    class ColorJitter:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tv = types.ModuleType('torchvision')
    tr = types.ModuleType('torchvision.transforms')
    tr.ToTensor, tr.Normalize = ToTensor, Normalize
    tr.ColorJitter, tr.Compose = ColorJitter, Compose
    tv.transforms = tr
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.transforms'] = tr
    return ('torchvision', 'torchvision.transforms')


@pytest.fixture(scope='module')
def ref_dataset(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp('esa_fixture')
    rng = np.random.default_rng(0)
    # structured frame: smooth gradients + texture, so resize parity is
    # actually exercised (a constant image would pass trivially)
    yy, xx = np.mgrid[0:1200, 0:1920]
    frame = (80 + 60 * np.sin(xx / 97.0) + 50 * np.cos(yy / 53.0)
             + rng.uniform(0, 40, size=(1200, 1920)))
    frame = np.clip(frame, 0, 255).astype(np.uint8)
    (tmp / 'images').mkdir()
    Image.fromarray(frame, mode='L').save(tmp / 'images' / 'img000001.png')

    records = []
    for bbox in BBOXES:
        records.append({
            'rgb_pth': 'img000001.png',
            'bbox': list(bbox),
            'sift': rng.uniform(bbox[0], bbox[2], size=(30, 2)),
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
        time.clock = time.perf_counter   # removed in py3.8; used at :190
    sys.path.insert(0, REF_DIR)
    cwd = os.getcwd()
    os.chdir(tmp)                        # the dataset opens data/test.pkl
    try:
        spec = importlib.util.spec_from_file_location('ref_data_load4',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ds = mod.ESADataSet(root=str(tmp / 'images') + '/', train=False,
                            scale=SCALE, gauss_size=2)
        yield ds, records, frame
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
    from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops

    _, records, frame = ref_dataset
    frames = jnp.asarray(np.stack([frame] * len(records)).astype(np.float32))
    bboxes = jnp.asarray(np.array(BBOXES, np.float32))
    origin, crop_sizes, size = crop_ops.adjust_bbox(bboxes)
    crops = crop_ops.crop_resize_from_boxes(frames, origin, crop_sizes,
                                            size, SCALE)
    rates = SCALE / size.astype(jnp.float32)
    image = crop_ops.normalize(crops)
    kp = jnp.asarray(np.stack([r['sift'] for r in records]).astype(np.float32))
    kp_crop = (kp - origin[:, None, :].astype(jnp.float32)) \
        * rates[:, None, None]
    hm = heatmap_ops.render_heatmaps(kp_crop, SCALE, SCALE, 2.0,
                                     one_indexed=True)
    wm = heatmap_ops.weight_maps(hm)
    return {
        'origin': np.asarray(origin), 'crop_sizes': np.asarray(crop_sizes),
        'rate': np.asarray(rates), 'image': np.asarray(image),
        'heatmaps': np.asarray(hm), 'weights': np.asarray(wm),
    }


@pytest.mark.parametrize('i', range(len(BBOXES)))
def test_item_matches_reference(ref_dataset, ours, i):
    ds, _, _ = ref_dataset
    (image, label, weights), (bbox, rate, _sift, _s3d, _K, _RT, _q, _img) = \
        ds[i]

    x_new, y_new, w_new, h_new = bbox
    assert ours['origin'][i].tolist() == [x_new, y_new]
    assert ours['crop_sizes'][i].tolist() == [w_new - x_new, h_new - y_new]
    np.testing.assert_allclose(ours['rate'][i], rate, rtol=1e-6)

    # crop pixels: reference resizes in uint8 (rounded) with cv2's
    # fixed-point bilinear; ours is float MXU matmuls -> ~1.5 gray levels
    # = 1.5/255/0.229 after normalization
    np.testing.assert_allclose(ours['image'][i], image.numpy()[0],
                               atol=0.03)

    np.testing.assert_allclose(ours['heatmaps'][i], label.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(ours['weights'][i], weights.numpy(),
                               atol=1e-5)
