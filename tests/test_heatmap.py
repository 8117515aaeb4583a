"""Heatmap rendering / weight map tests against the reference numpy semantics
(data_load4.py:54-64, loss.py:133-139)."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from esa_pose_estimation_tpu.ops import heatmap


def reference_center_label_heatmap(w, h, cx, cy, sigma):
    # Transcription of data_load4.py:54-64 (1-indexed meshgrid).
    X1 = np.linspace(1, w, w)
    Y1 = np.linspace(1, h, h)
    X, Y = np.meshgrid(X1, Y1)
    D2 = (X - cx) ** 2 + (Y - cy) ** 2
    return np.exp(-D2 / (2.0 * sigma * sigma))


def reference_weight_map(hm):
    # Transcription of loss.py:133-139.
    dilate = ndimage.grey_dilation(hm, size=(3, 3))
    wm = hm.copy()
    wm[np.where(dilate > 0.2)] = 1
    return wm


class TestRenderHeatmaps:
    def test_matches_reference_one_indexed(self):
        kps = np.array([[37.3, 80.9], [5.0, 5.0], [100.2, 17.7]])
        ours = np.asarray(heatmap.render_heatmaps(
            jnp.asarray(kps, jnp.float32), 128, 128, 2.0, one_indexed=True))
        for i, (cx, cy) in enumerate(kps):
            ref = reference_center_label_heatmap(128, 128, cx, cy, 2.0)
            np.testing.assert_allclose(ours[i], ref, atol=1e-5)

    def test_zero_indexed_peak_at_keypoint(self):
        kps = jnp.array([[[40.0, 60.0]]], jnp.float32)  # batch of 1, K=1
        hm = np.asarray(heatmap.render_heatmaps(kps, 128, 128, 2.0))
        assert hm.shape == (1, 1, 128, 128)
        py, px = np.unravel_index(hm[0, 0].argmax(), (128, 128))
        assert (px, py) == (40, 60)
        assert hm[0, 0, py, px] == 1.0

    def test_batch_shapes(self):
        kps = jnp.zeros((4, 30, 2), jnp.float32)
        hm = heatmap.render_heatmaps(kps, 64, 64)
        assert hm.shape == (4, 30, 64, 64)


class TestWeightMaps:
    def test_matches_scipy_grey_dilation(self):
        rng = np.random.default_rng(0)
        for _ in range(3):
            cx, cy = rng.uniform(4, 124, size=2)
            hm = reference_center_label_heatmap(128, 128, cx, cy, 2.0)
            ref = reference_weight_map(hm.copy())
            ours = np.asarray(heatmap.weight_maps(jnp.asarray(hm, jnp.float32)))
            np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_edge_keypoint(self):
        # Peak on the border: reduce_window edge handling must match scipy's
        # reflect-at-border for a radius-1 flat kernel.
        hm = reference_center_label_heatmap(32, 32, 1.0, 1.0, 2.0)
        ref = reference_weight_map(hm.copy())
        ours = np.asarray(heatmap.weight_maps(jnp.asarray(hm, jnp.float32)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_batched(self):
        kps = jnp.array([[[10.0, 10.0], [50.0, 50.0]]], jnp.float32)
        hm, wm = heatmap.render_targets(kps, 64, 64)
        assert hm.shape == wm.shape == (1, 2, 64, 64)
        assert np.asarray(wm).max() == 1.0
