"""Pallas fused peak-decode kernel vs the XLA reference implementation
(interpreter mode on the CPU backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.ops import heatmap, peak
from esa_pose_estimation_tpu.ops.pallas import decode_heatmaps_pallas


class TestPallasPeakDecode:
    def test_matches_xla_decode_on_gaussians(self):
        rng = np.random.default_rng(0)
        kps = rng.uniform(6, 120, size=(3, 5, 2)).astype(np.float32)
        hm = heatmap.render_heatmaps(jnp.asarray(kps), 128, 128, 2.0)
        c_ref, m_ref = peak.decode_heatmaps(hm)
        c_pal, m_pal = decode_heatmaps_pallas(hm)
        np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref),
                                   atol=1e-6)

    def test_matches_on_noise(self):
        rng = np.random.default_rng(1)
        hm = jnp.asarray(rng.uniform(size=(4, 3, 64, 64)), jnp.float32)
        c_ref, m_ref = peak.decode_heatmaps(hm)
        c_pal, m_pal = decode_heatmaps_pallas(hm)
        np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref),
                                   atol=1e-6)

    def test_border_peak(self):
        hm = np.full((1, 8, 8), 1e-3, np.float32)
        hm[0, 0, 1] = 1.0
        c, m = decode_heatmaps_pallas(jnp.asarray(hm))
        np.testing.assert_array_equal(np.asarray(c[0]), [1.0, 0.0])
        assert float(m[0]) == 1.0
