"""Peak decode tests against a transcription of the reference my_taylor
(inference.py:75-94) and get_max_preds (inference.py:22-51)."""

import math

import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.experimental import nhwc_decode
from esa_pose_estimation_tpu.ops import heatmap, peak


def reference_my_taylor(hm, coord):
    # Transcription of inference.py:75-94 (operating on the raw heatmap,
    # floored at 1e-10 as in get_final, inference.py:141).
    hm = np.maximum(hm, 1e-10)
    H, W = hm.shape
    px, py = int(coord[0]), int(coord[1])
    coord = coord.astype(np.float64).copy()
    if 1 < px < W - 2 and 1 < py < H - 2:
        hx = 0.5 * (math.log(hm[py][px + 1]) - math.log(hm[py][px - 1]))
        hy = 0.5 * (math.log(hm[py + 1][px]) - math.log(hm[py - 1][px]))
        hxx = 0.25 * (math.log(hm[py][px + 2]) - 2 * math.log(hm[py][px])
                      + math.log(hm[py][px - 2]))
        hyy = 0.25 * (math.log(hm[py + 2][px]) - 2 * math.log(hm[py][px])
                      + math.log(hm[py - 2][px]))
        if hxx != 0 and hyy != 0:
            offset = [-hx / hxx, -hy / hyy]
            if offset[0] < 1 and offset[1] < 1:
                coord += offset
    return coord


class TestArgmaxPeaks:
    def test_matches_numpy_argmax(self):
        rng = np.random.default_rng(0)
        hm = rng.uniform(size=(2, 5, 32, 48)).astype(np.float32)
        coords, maxvals = peak.argmax_peaks(jnp.asarray(hm))
        flat = hm.reshape(2, 5, -1)
        idx = flat.argmax(-1)
        np.testing.assert_array_equal(np.asarray(coords[..., 0]), idx % 48)
        np.testing.assert_array_equal(np.asarray(coords[..., 1]), idx // 48)
        np.testing.assert_allclose(np.asarray(maxvals), flat.max(-1))


class TestTaylorRefine:
    def test_recovers_subpixel_gaussian_center(self):
        # A sampled Gaussian's log is exactly quadratic: the 5-point stencil
        # recovers the continuous center to machine precision.
        kps = np.array([[43.37, 71.81], [12.25, 90.6], [64.0, 64.0]])
        hm = heatmap.render_heatmaps(jnp.asarray(kps, jnp.float32), 128, 128, 2.0)
        coords, maxvals = peak.decode_heatmaps(hm)
        np.testing.assert_allclose(np.asarray(coords), kps, atol=2e-2)
        np.testing.assert_allclose(np.asarray(maxvals),
                                   [np.exp(-((.37**2+.19**2)/8)),
                                    np.exp(-((.25**2+.4**2)/8)), 1.0], atol=1e-3)

    def test_matches_reference_on_noisy_maps(self):
        rng = np.random.default_rng(1)
        kps = rng.uniform(6, 120, size=(16, 2))
        hm = np.asarray(heatmap.render_heatmaps(
            jnp.asarray(kps, jnp.float32), 128, 128, 2.0))
        hm = np.clip(hm + rng.normal(scale=0.01, size=hm.shape), 0, 1).astype(np.float32)
        coords, _ = peak.decode_heatmaps(jnp.asarray(hm))
        coords = np.asarray(coords)
        for i in range(16):
            flat_idx = hm[i].argmax()
            c0 = np.array([flat_idx % 128, flat_idx // 128], np.float32)
            expected = reference_my_taylor(hm[i], c0)
            np.testing.assert_allclose(coords[i], expected, atol=1e-3)

    def test_border_peak_not_refined(self):
        hm = np.full((8, 8), 1e-3, np.float32)
        hm[0, 1] = 1.0
        coords, _ = peak.decode_heatmaps(jnp.asarray(hm))
        np.testing.assert_array_equal(np.asarray(coords), [1.0, 0.0])


class TestSelectConfident:
    def test_threshold_only(self):
        mv = jnp.array([0.9, 0.5, 0.7, 0.61])
        mask = peak.select_confident(mv, threshold=0.6)
        np.testing.assert_array_equal(np.asarray(mask), [True, False, True, True])

    def test_min_count_floor(self):
        # val.py:172-175: large_k = max(#(>0.8), 24) over 30 keypoints.
        rng = np.random.default_rng(2)
        mv = rng.uniform(0, 0.7, size=30)  # nothing above 0.8
        mask = np.asarray(peak.select_confident(jnp.asarray(mv), 0.8, 24))
        assert mask.sum() == 24
        # the selected ones are exactly the top-24 by confidence
        top24 = set(np.argsort(-mv)[:24].tolist())
        assert set(np.where(mask)[0].tolist()) == top24

    def test_union_semantics(self):
        mv = np.zeros(30)
        mv[:5] = 0.95
        mask = np.asarray(peak.select_confident(jnp.asarray(mv), 0.8, 24))
        assert mask.sum() == 24 and mask[:5].all()


class TestNHWCDecode:
    """The channels-last decode must match the NCHW path bit-for-bit —
    it is the same math with K moved into the vector lanes."""

    def _random_maps(self, seed, b=3, k=7, h=40, w=56):
        rng = np.random.default_rng(seed)
        # smooth-ish positive maps with distinct peaks + some exact ties
        hm = rng.uniform(size=(b, h, w, k)).astype(np.float32)
        hm[0, 5, 5, 0] = 2.0          # interior peak
        hm[0, 0, 0, 1] = 2.0          # border peak (offset must be gated)
        hm[1, 2, 2, 2] = 2.0          # near-border (px=2 is interior edge)
        return hm

    def test_matches_nchw_decode(self):
        hm = self._random_maps(1)
        nchw = np.moveaxis(hm, -1, 1)
        c_ref, m_ref = peak.decode_heatmaps(jnp.asarray(nchw))
        c_new, m_new = nhwc_decode.decode_heatmaps_nhwc(jnp.asarray(hm))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_new))
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_new))

    def test_auto_nhwc_dispatch(self):
        hm = self._random_maps(2)
        nchw = np.moveaxis(hm, -1, 1)
        c_ref, m_ref = peak.decode_heatmaps(jnp.asarray(nchw))
        old = peak.NHWC_DECODE
        try:
            for forced in (True, False):
                peak.NHWC_DECODE = forced
                c, m = peak.decode_heatmaps_auto_nhwc(jnp.asarray(hm))
                np.testing.assert_array_equal(np.asarray(m_ref),
                                              np.asarray(m))
                np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c),
                                           atol=1e-6)
        finally:
            peak.NHWC_DECODE = old

    def test_flat_map_all_ties(self):
        hm = np.ones((1, 8, 8, 3), np.float32)
        c_n, m_n = nhwc_decode.decode_heatmaps_nhwc(jnp.asarray(hm))
        c_o, m_o = peak.decode_heatmaps(jnp.asarray(np.moveaxis(hm, -1, 1)))
        np.testing.assert_array_equal(np.asarray(c_n), np.asarray(c_o))
        np.testing.assert_array_equal(np.asarray(m_n), np.asarray(m_o))

    def test_bf16_input_decodes_in_f32(self):
        # A bf16 serving tail must get f32-grade decode from EVERY arm
        # (the Pallas kernel upcasts; the XLA paths must match).
        hm = self._random_maps(3).astype(jnp.bfloat16)
        f32 = np.asarray(hm, np.float32)
        c_ref, m_ref = peak.decode_heatmaps(jnp.asarray(np.moveaxis(f32, -1, 1)))
        c_n, m_n = nhwc_decode.decode_heatmaps_nhwc(hm)
        c_o, m_o = peak.decode_heatmaps(jnp.moveaxis(hm, -1, 1))
        assert m_n.dtype == jnp.float32 and m_o.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_n))
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_o))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_n))
