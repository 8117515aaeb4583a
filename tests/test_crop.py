"""Crop/resize pipeline tests against a numpy+cv2 transcription of the
reference ESADataSet crop path (data_load4.py:110-166)."""

import cv2
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.ops import crop


def reference_crop(img, bbox, scale, img_w=1920, img_h=1200):
    # Transcription of data_load4.py:110-166.
    x, y, w, h = bbox
    c0 = int((x + w) / 2)
    c1 = int((y + h) / 2)
    size = int(max((w - x), (h - y)) / 2)
    x_new = int(c0 - 1.05 * size)
    y_new = int(c1 - 1.05 * size)
    w_new = int(c0 + 1.05 * size)
    h_new = int(c1 + 1.05 * size)
    if (w_new - x_new) != (h_new - y_new):
        h_new = y_new + (w_new - x_new)
    if x_new < 0:
        w_new -= x_new
        x_new = 0
    if y_new < 0:
        h_new -= y_new
        y_new = 0
    if w_new > img_w:
        x_new = x_new + img_w - w_new
        if x_new < 0:
            x_new = 0
        w_new = img_w
    if h_new > img_h:
        y_new = y_new + img_h - h_new
        if y_new < 0:
            y_new = 0
        h_new = img_h
    size = max(w_new - x_new, h_new - y_new)
    xsize = w_new - x_new
    ysize = h_new - y_new
    image = img[y_new:h_new, x_new:w_new]
    if xsize != size or ysize != size:
        image = np.pad(image, ((0, size - ysize), (0, size - xsize)), 'edge')
    rate = 1.0
    if size != scale:
        rate = scale / size
        image = cv2.resize(image, (scale, scale))
    return image, rate, (x_new, y_new)


def make_image(seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish synthetic image so interpolation differences are meaningful
    img = rng.uniform(0, 255, size=(1200 // 8, 1920 // 8)).astype(np.float32)
    img = cv2.resize(img, (1920, 1200), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestAdjustBbox:
    def test_matches_reference_arithmetic(self):
        img = make_image()
        cases = [
            (300, 400, 700, 900),      # interior
            (10, 20, 200, 180),        # near top-left
            (1500, 900, 1919, 1199),   # bottom-right corner
            (0, 0, 1920, 1200),        # full frame
            (5, 1000, 300, 1195),      # tall/edge
        ]
        for bbox in cases:
            _, ref_rate, ref_origin = reference_crop(img, bbox, 128)
            origin, crop_sizes, size = crop.adjust_bbox(
                jnp.asarray(bbox, jnp.float32))
            assert tuple(np.asarray(origin)) == ref_origin, bbox
            assert float(128 / np.asarray(size)) == ref_rate or \
                np.isclose(128 / float(np.asarray(size)), ref_rate), bbox


class TestCropResize:
    def test_matches_cv2_pipeline(self):
        img = make_image(1)
        for bbox in [(300, 400, 700, 900), (10, 20, 200, 180),
                     (1500, 900, 1919, 1199)]:
            ref_img, ref_rate, ref_origin = reference_crop(img, bbox, 128)
            crops, rates, origins = crop.crop_resize(
                jnp.asarray(img[None]), jnp.asarray([bbox], jnp.float32), 128)
            assert np.isclose(float(rates[0]), ref_rate, rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(origins[0]), ref_origin)
            diff = np.abs(np.asarray(crops[0]) - ref_img.astype(np.float32))
            # bilinear vs cv2's fixed-point bilinear: allow ~1.5 gray levels
            assert diff.mean() < 0.6, (bbox, diff.mean())
            assert diff.max() < 30.0, (bbox, diff.max())

    def test_keypoint_roundtrip(self):
        # kp -> crop space -> back must be the identity (demo.py:246).
        bbox = jnp.asarray([[300.0, 400, 700, 900]], jnp.float32)
        origin, _, size = crop.adjust_bbox(bbox)
        rate = 128.0 / np.asarray(size, np.float32)
        kp = np.array([[450.0, 620.0]])
        kp_crop = rate[:, None] * (kp - np.asarray(origin))
        kp_back = kp_crop / rate[:, None] + np.asarray(origin)
        np.testing.assert_allclose(kp_back, kp, rtol=1e-6)

    def test_multichannel(self):
        img = np.stack([make_image(2)] * 3, axis=-1)
        crops, _, _ = crop.crop_resize(
            jnp.asarray(img[None]), jnp.asarray([[100.0, 100, 400, 500]]), 64)
        assert crops.shape == (1, 64, 64, 3)

    def test_normalize(self):
        x = jnp.full((2, 4, 4), 255.0)
        out = np.asarray(crop.normalize(x))
        np.testing.assert_allclose(out, (1.0 - 0.449) / 0.229, rtol=1e-6)
