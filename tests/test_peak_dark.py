"""DARK-style decode (gaussian modulation + full-Hessian Taylor) vs the
reference transcriptions (inference.py:54-73 taylor, :96-110 gaussian_blur,
:154-170 get_final2)."""

import cv2
import numpy as np

import jax.numpy as jnp

from esa_pose_estimation_tpu.ops import heatmap, peak


def reference_gaussian_blur(hm, kernel=11):
    # Transcription of inference.py:96-110 for a (K, H, W) stack.
    border = (kernel - 1) // 2
    out = hm.copy()
    for j in range(hm.shape[0]):
        origin_max = np.max(hm[j])
        dr = np.zeros((hm.shape[1] + 2 * border, hm.shape[2] + 2 * border))
        dr[border:-border, border:-border] = hm[j].copy()
        dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
        out[j] = dr[border:-border, border:-border]
        out[j] *= origin_max / np.max(out[j])
    return out


def reference_taylor(hm_log, coord):
    # Transcription of inference.py:54-73 (on a log map).
    H, W = hm_log.shape
    px, py = int(coord[0]), int(coord[1])
    coord = coord.astype(np.float64).copy()
    if 1 < px < W - 2 and 1 < py < H - 2:
        dx = 0.5 * (hm_log[py][px + 1] - hm_log[py][px - 1])
        dy = 0.5 * (hm_log[py + 1][px] - hm_log[py - 1][px])
        dxx = 0.25 * (hm_log[py][px + 2] - 2 * hm_log[py][px]
                      + hm_log[py][px - 2])
        dxy = 0.25 * (hm_log[py + 1][px + 1] - hm_log[py - 1][px + 1]
                      - hm_log[py + 1][px - 1] + hm_log[py - 1][px - 1])
        dyy = 0.25 * (hm_log[py + 2][px] - 2 * hm_log[py][px]
                      + hm_log[py - 2][px])
        derivative = np.array([[dx], [dy]])
        hessian = np.array([[dxx, dxy], [dxy, dyy]])
        if dxx * dyy - dxy ** 2 != 0:
            offset = (-np.linalg.inv(hessian) @ derivative)[:, 0]
            coord += offset
    return coord


class TestGaussianModulate:
    def test_matches_cv2(self):
        rng = np.random.default_rng(0)
        kps = rng.uniform(10, 50, size=(3, 2))
        hm = np.asarray(heatmap.render_heatmaps(
            jnp.asarray(kps, jnp.float32), 64, 64, 2.0), np.float64)
        hm += rng.uniform(0, 0.02, hm.shape)
        ref = reference_gaussian_blur(hm)
        ours = np.asarray(peak.gaussian_modulate(jnp.asarray(hm, jnp.float32)))
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestDarkDecode:
    def test_matches_reference_get_final2(self):
        rng = np.random.default_rng(1)
        kps = rng.uniform(8, 56, size=(4, 2))
        hm = np.asarray(heatmap.render_heatmaps(
            jnp.asarray(kps, jnp.float32), 64, 64, 2.0), np.float64)
        hm = np.clip(hm + rng.normal(scale=0.01, size=hm.shape), 0, 1)

        coords, _ = peak.decode_heatmaps_dark(jnp.asarray(hm, jnp.float32))
        coords = np.asarray(coords)

        blurred = reference_gaussian_blur(hm.copy())
        log_hm = np.log(np.maximum(blurred, 1e-10))
        for i in range(4):
            flat = hm[i].argmax()
            c0 = np.array([flat % 64, flat // 64], np.float64)
            expected = reference_taylor(log_hm[i], c0)
            np.testing.assert_allclose(coords[i], expected, atol=5e-3)

    def test_recovers_subpixel(self):
        kps = np.array([[30.42, 21.77]], np.float32)
        hm = heatmap.render_heatmaps(jnp.asarray(kps), 64, 64, 2.0)
        coords, _ = peak.decode_heatmaps_dark(hm)
        np.testing.assert_allclose(np.asarray(coords[0]), kps[0], atol=0.12)
