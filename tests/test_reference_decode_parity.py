"""Decode-path parity against the ACTUAL reference inference.py.

Loads the reference module (inference.py:22-170) from the checkout and
compares, on the same random heatmaps:

* ``argmax_peaks``          vs ``get_max_preds``   (inference.py:22-51)
* ``decode_heatmaps``       vs ``get_max_preds`` + ``get_final``/``my_taylor``
                            (inference.py:75-94,136-152 — the production
                            decode at demo.py:191 / val.py:168)
* ``decode_heatmaps_dark``  vs ``gaussian_blur`` + ``get_final2``/``taylor``
                            (inference.py:54-73,96-110,154-170)

The reference code runs per-keypoint python loops on float64; ours is one
batched f32 XLA program, so tolerances are a few 1e-4 px.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = '/root/reference'
REF_PATH = os.path.join(REF_DIR, 'inference.py')

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref():
    # inference.py does ``from transforms import transform_preds``
    sys.path.insert(0, REF_DIR)
    try:
        spec = importlib.util.spec_from_file_location('ref_inference',
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_DIR)
    return mod


@pytest.fixture(scope='module')
def heatmaps():
    """Gaussian-blob maps (1, K, H, W) like the network's output: most
    peaks interior, one near the border (gates the Taylor step), one
    nearly-flat map (exercises the hxx==0 / det==0 gates)."""
    rng = np.random.default_rng(0)
    k, h, w = 8, 48, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    centers = rng.uniform(6, 42, size=(k, 2))
    centers[-2] = (1.0, 1.0)          # border peak: refinement must be gated
    maps = np.exp(-((xx - centers[:, None, None, 0]) ** 2
                    + (yy - centers[:, None, None, 1]) ** 2) / (2 * 2.0 ** 2))
    maps[-1] = 0.0                    # flat map: argmax 0, zero offset
    maps += rng.uniform(0, 1e-3, size=maps.shape)
    return maps[None].astype(np.float32)


def test_argmax_matches_reference(ref, heatmaps):
    from esa_pose_estimation_tpu.ops.peak import argmax_peaks
    want_coords, want_max = ref.get_max_preds(heatmaps.copy())
    got_coords, got_max = argmax_peaks(heatmaps)
    np.testing.assert_array_equal(np.asarray(got_coords), want_coords)
    np.testing.assert_allclose(np.asarray(got_max), want_max[..., 0],
                               rtol=1e-6)


def test_taylor_decode_matches_reference(ref, heatmaps):
    from esa_pose_estimation_tpu.ops.peak import decode_heatmaps
    coords, _ = ref.get_max_preds(heatmaps.copy())
    # get_final mutates coords and reads hm[0] (single-image batch)
    want = ref.get_final(heatmaps.astype(np.float64).copy(),
                         coords[0].astype(np.float64).copy())
    got, _ = decode_heatmaps(heatmaps)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=5e-4)


def test_dark_decode_matches_reference(ref, heatmaps):
    from esa_pose_estimation_tpu.ops.peak import decode_heatmaps_dark
    coords, _ = ref.get_max_preds(heatmaps.copy())
    want = ref.get_final2(heatmaps.astype(np.float64).copy(),
                          coords[0].astype(np.float64).copy())
    got, _ = decode_heatmaps_dark(heatmaps)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-3)
