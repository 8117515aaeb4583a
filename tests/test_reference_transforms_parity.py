"""Parity against the ACTUAL reference ``transforms.py`` (the
HRNet-family flip-TTA / affine helpers, transforms.py:16-122).

Compares our batched jittable ops (ops/transforms.py) with the upstream
numpy/cv2 implementations on shared inputs: flip_back (heatmap un-flip +
pair swap), fliplr_joints, get_affine_transform (fwd + inv, with
rotation), transform_preds, and the warpAffine ``crop``.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

REF_PATH = '/root/reference/transforms.py'

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref_tf():
    spec = importlib.util.spec_from_file_location('ref_transforms', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MATCHED = [(0, 3), (1, 4)]


def test_flip_back(ref_tf):
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.ops import transforms as tf

    rng = np.random.default_rng(0)
    hm = rng.uniform(size=(2, 6, 16, 16)).astype(np.float32)
    ref = ref_tf.flip_back(hm.copy(), MATCHED)
    ours = np.asarray(tf.flip_back(jnp.asarray(hm), MATCHED))
    np.testing.assert_allclose(ours, ref, atol=1e-7)
    # empty pair list (the SPEED case) is just a width flip
    ref0 = ref_tf.flip_back(hm.copy(), [])
    ours0 = np.asarray(tf.flip_back(jnp.asarray(hm)))
    np.testing.assert_allclose(ours0, ref0, atol=1e-7)


def test_fliplr_joints(ref_tf):
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.ops import transforms as tf

    rng = np.random.default_rng(1)
    joints = rng.uniform(0, 64, size=(6, 2)).astype(np.float32)
    vis = (rng.uniform(size=(6, 1)) > 0.3).astype(np.float32)
    vis = np.repeat(vis, 2, axis=1)
    rj, rv = ref_tf.fliplr_joints(joints.copy(), vis.copy(), 64, MATCHED)
    oj, ov = tf.fliplr_joints(jnp.asarray(joints), jnp.asarray(vis), 64,
                              MATCHED)
    np.testing.assert_allclose(np.asarray(oj), rj, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ov), rv, atol=1e-7)


@pytest.mark.parametrize('rot', [0.0, 25.0])
@pytest.mark.parametrize('inv', [False, True])
def test_get_affine_transform(ref_tf, rot, inv):
    from esa_pose_estimation_tpu.ops import transforms as tf

    center = np.array([70.0, 55.0], np.float32)
    scale = np.array([0.6, 0.8], np.float32)
    ref = ref_tf.get_affine_transform(center, scale, rot, [48, 64],
                                      inv=1 if inv else 0)
    ours = np.asarray(tf.get_affine_transform(center, scale, rot, [48, 64],
                                              inv=inv))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_transform_preds(ref_tf):
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.ops import transforms as tf

    rng = np.random.default_rng(2)
    coords = rng.uniform(0, 48, size=(7, 2)).astype(np.float32)
    center = np.array([100.0, 80.0], np.float32)
    scale = np.array([0.7, 0.7], np.float32)
    ref = ref_tf.transform_preds(coords.copy(), center, scale, [48, 64])
    ours = np.asarray(tf.transform_preds(jnp.asarray(coords), center,
                                         scale, [48, 64]))
    np.testing.assert_allclose(ours, ref, atol=1e-2)


@pytest.mark.parametrize('rot', [0.0, 30.0])
def test_crop_matches_warp_affine(ref_tf, rot):
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.ops import transforms as tf

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:120, 0:160]
    img = np.clip(100 + 70 * np.sin(xx / 9.0) + 50 * np.cos(yy / 13.0)
                  + rng.uniform(0, 20, (120, 160)), 0, 255).astype(np.uint8)
    center = np.array([80.0, 60.0], np.float32)
    scale = np.array([0.4, 0.4], np.float32)
    ref = ref_tf.crop(img, center, scale, [48, 64], rot=rot)
    ours = np.asarray(tf.crop(jnp.asarray(img, jnp.float32)[None], center,
                              scale, [48, 64], rot=rot))[0]
    assert ours.shape == ref.shape
    # interior comparison: cv2 fixed-point uint8 bilinear vs float taps
    np.testing.assert_allclose(ours[2:-2, 2:-2],
                               ref.astype(np.float32)[2:-2, 2:-2], atol=2.0)
