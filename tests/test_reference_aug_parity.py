"""Golden parity for the PVNet crop/resize augmentation family against the
ACTUAL reference ``lib/datasets/augmentation.py``.

The reference functions draw their parameters from ``np.random`` inline;
to compare deterministically, those draws are stubbed with queued values
(recording what each call returned), the reference function runs on a
fixture image/mask/hcoords, and our batched deterministic cores
(data/augment.py) are fed exactly the same sampled parameters:

* crop_or_padding_to_fixed_size            (augmentation.py:160-185)
* crop_or_padding_to_fixed_size_instance   (augmentation.py:118-158)
* crop_resize_instance_v1                  (augmentation.py:250-279)
* crop_resize_instance_v2 + compute_resize_range (:281-313, :235-247)
* crop_or_padding                          (augmentation.py:75-116)
* add_noise (gaussian + motion-blur branches)    (:207-233)

Pixel tolerances: integer-window ops compare exactly; resizes allow ~2
gray levels (cv2 fixed-point uint8 bilinear vs our float matmuls); masks
(INTER_NEAREST, floor rule) compare exactly.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

REF_PATH = '/root/reference/lib/datasets/augmentation.py'

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref_aug():
    spec = importlib.util.spec_from_file_location('ref_augmentation',
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fixture_data():
    """Structured RGB image + blobby instance mask + homogeneous coords."""
    rng = np.random.default_rng(3)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        80 + 60 * np.sin(xx / 13.0) + 40 * np.cos(yy / 7.0),
        rng.uniform(0, 255, (h, w)),
        (xx * 2 + yy) % 256,
    ], axis=-1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[30:70, 40:95] = 1
    mask[25:35, 60:80] = 1
    kp = rng.uniform([35, 25], [100, 75], size=(8, 2)).astype(np.float32)
    hcoords = np.concatenate([kp, np.ones((8, 1), np.float32)], axis=1)
    return img, mask, hcoords


class _FakeRandom:
    """Queue-driven stand-ins for the np.random calls the reference makes;
    records every returned value so our cores get identical parameters."""

    def __init__(self, monkeypatch, uniform=(), randint=(), random=(),
                 rand=(), randn=None):
        self.q = {'uniform': list(uniform), 'randint': list(randint),
                  'random': list(random), 'rand': list(rand)}
        self.calls = {'uniform': [], 'randint': [], 'random': [],
                      'rand': []}
        self.randn_value = randn

        def uniform_stub(lo=0.0, hi=1.0, size=None):
            v = self.q['uniform'].pop(0)
            self.calls['uniform'].append((lo, hi, v))
            return v

        def randint_stub(lo, hi=None, size=None):
            v = self.q['randint'].pop(0)
            if hi is not None:
                # keep the preset inside the reference's sampled range
                # (a real randint(lo, hi) can never leave it)
                v = int(np.clip(v, lo, hi - 1))
            self.calls['randint'].append((lo, hi, v))
            if size is not None:
                return np.asarray([v])
            return v

        def random_stub(size=None):
            v = self.q['random'].pop(0)
            self.calls['random'].append(v)
            return v

        def rand_stub(*shape):
            v = self.q['rand'].pop(0)
            self.calls['rand'].append(v)
            return np.asarray([v]) if shape else v

        def randn_stub(*shape):
            assert self.randn_value is not None
            assert self.randn_value.shape == shape
            return self.randn_value

        monkeypatch.setattr(np.random, 'uniform', uniform_stub)
        monkeypatch.setattr(np.random, 'randint', randint_stub)
        monkeypatch.setattr(np.random, 'random', random_stub)
        monkeypatch.setattr(np.random, 'rand', rand_stub)
        monkeypatch.setattr(np.random, 'randn', randn_stub)


def _ours():
    from esa_pose_estimation_tpu.data import augment
    return augment


@pytest.mark.parametrize('th,tw,hbeg,wbeg', [
    (64, 96, 11, 17),      # crop both axes
    (128, 96, 0, 25),      # pad rows, crop cols
    (128, 160, 0, 0),      # pad both
])
def test_crop_or_padding_to_fixed_size(ref_aug, fixture_data, monkeypatch,
                                       th, tw, hbeg, wbeg):
    import jax.numpy as jnp
    aug = _ours()
    img, mask, _ = fixture_data
    h, w = img.shape[:2]
    randints = []
    if th < h:
        randints.append(hbeg)
    if tw < w:
        randints.append(wbeg)
    _FakeRandom(monkeypatch, randint=randints)
    ref_img, ref_mask = ref_aug.crop_or_padding_to_fixed_size(
        img.copy(), mask.copy(), th, tw)

    out_img, out_mask = aug.crop_or_padding_to_fixed_size(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(mask)[None],
        jnp.asarray([hbeg]), jnp.asarray([wbeg]), th, tw)
    np.testing.assert_array_equal(np.asarray(out_img)[0], ref_img)
    np.testing.assert_array_equal(np.asarray(out_mask)[0], ref_mask)


@pytest.mark.parametrize('th,tw,hbeg,wbeg', [
    (64, 96, 20, 30),
    (128, 80, 0, 40),
])
def test_crop_or_padding_to_fixed_size_instance(ref_aug, fixture_data,
                                                monkeypatch, th, tw,
                                                hbeg, wbeg):
    import jax.numpy as jnp
    aug = _ours()
    img, mask, hcoords = fixture_data
    h, w = img.shape[:2]
    randints = []
    if th < h:
        randints.append(hbeg)
    if tw < w:
        randints.append(wbeg)
    fake = _FakeRandom(monkeypatch, randint=randints)
    ref_img, ref_mask, ref_hc = ref_aug.crop_or_padding_to_fixed_size_instance(
        img.copy(), mask.copy(), hcoords.copy(), th, tw, overlap_ratio=0.5)
    # sampled begins were drawn inside the window range our op computes
    # (the reference only calls randint on axes that CROP)
    hrmin, hrmax, wrmin, wrmax = aug.instance_window_range(
        jnp.asarray(mask)[None], th, tw, overlap_ratio=0.5)
    expected_ranges = []
    if th < h:
        expected_ranges.append((int(hrmin[0]), int(hrmax[0])))
    if tw < w:
        expected_ranges.append((int(wrmin[0]), int(wrmax[0])))
    assert len(fake.calls['randint']) == len(expected_ranges)
    for (lo, hi, _v), (olo, ohi) in zip(fake.calls['randint'],
                                        expected_ranges):
        assert lo == olo and hi == ohi

    out_img, out_mask, out_kp = aug.crop_or_padding_to_fixed_size_instance(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(mask)[None],
        jnp.asarray(hcoords[:, :2])[None],
        jnp.asarray([hbeg]), jnp.asarray([wbeg]), th, tw)
    np.testing.assert_array_equal(np.asarray(out_img)[0], ref_img)
    np.testing.assert_array_equal(np.asarray(out_mask)[0], ref_mask)
    np.testing.assert_allclose(np.asarray(out_kp)[0], ref_hc[:, :2],
                               atol=1e-4)


@pytest.mark.parametrize('ratio,hbeg,wbeg', [
    (0.85, 5, 9),         # crop-then-upscale
    (1.3, 0, 0),          # pad-then-downscale
])
def test_crop_resize_instance_v1(ref_aug, fixture_data, monkeypatch,
                                 ratio, hbeg, wbeg):
    import jax.numpy as jnp
    aug = _ours()
    img, mask, hcoords = fixture_data
    h, w = img.shape[:2]
    th, tw = int(h * ratio), int(w * ratio)
    randints = []
    if th < h:
        randints.append(hbeg)
    if tw < w:
        randints.append(wbeg)
    _FakeRandom(monkeypatch, uniform=[ratio], randint=randints)
    ref_img, ref_mask, ref_hc = ref_aug.crop_resize_instance_v1(
        img.copy(), mask.copy(), hcoords.copy(), h, w, overlap_ratio=0.5,
        ratio_min=0.8, ratio_max=1.2)

    out_img, out_mask, out_kp = aug.crop_resize_instance_v1(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(mask)[None],
        jnp.asarray(hcoords[:, :2])[None],
        jnp.asarray([ratio], jnp.float32),
        jnp.asarray([hbeg]), jnp.asarray([wbeg]), h, w)
    np.testing.assert_allclose(np.asarray(out_img)[0],
                               ref_img.astype(np.float32), atol=2.0)
    np.testing.assert_array_equal(np.asarray(out_mask)[0], ref_mask)
    np.testing.assert_allclose(np.asarray(out_kp)[0], ref_hc[:, :2],
                               atol=1e-2)


@pytest.mark.parametrize('coin', [0.5, 0.95])
def test_crop_resize_instance_v2(ref_aug, fixture_data, monkeypatch, coin):
    import jax.numpy as jnp
    aug = _ours()
    img, mask, hcoords = fixture_data
    h, w = img.shape[:2]
    out_h, out_w = 72, 104
    do_resize = coin < 0.8
    ratio = 0.9
    hbeg, wbeg = 6, 12
    uniforms = [ratio] if do_resize else []
    fake = _FakeRandom(monkeypatch, uniform=uniforms,
                       randint=[hbeg, wbeg], random=[coin])
    ref_img, ref_mask, ref_hc = ref_aug.crop_resize_instance_v2(
        img.copy(), mask.copy(), hcoords.copy(), out_h, out_w,
        overlap_ratio=0.5, hmin=30, hmax=135, wmin=30, wmax=130)

    if do_resize:
        # the reference drew r from compute_resize_range — ours matches
        rlo, rhi = aug.compute_resize_range(jnp.asarray(mask)[None],
                                            30, 135, 30, 130)
        lo, hi, _ = fake.calls['uniform'][0]
        np.testing.assert_allclose(float(rlo[0]), lo, rtol=1e-6)
        np.testing.assert_allclose(float(rhi[0]), hi, rtol=1e-6)

    # the stub clamps presets into the reference's sampled range — use
    # what the reference actually consumed
    hbeg_used, wbeg_used = (c[2] for c in fake.calls['randint'][:2])
    out_img, out_mask, out_kp = aug.crop_resize_instance_v2(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(mask)[None],
        jnp.asarray(hcoords[:, :2])[None],
        jnp.asarray([ratio], jnp.float32),
        jnp.asarray([do_resize]),
        jnp.asarray([hbeg_used]), jnp.asarray([wbeg_used]), out_h, out_w)
    np.testing.assert_allclose(np.asarray(out_img)[0],
                               ref_img.astype(np.float32), atol=2.0)
    np.testing.assert_array_equal(np.asarray(out_mask)[0], ref_mask)
    np.testing.assert_allclose(np.asarray(out_kp)[0], ref_hc[:, :2],
                               atol=1e-2)


@pytest.mark.parametrize('hratio,wratio', [
    (0.8, 0.9),     # crop both
    (1.2, 1.1),     # pad both
    (0.85, 1.15),   # mixed
])
def test_crop_or_padding(ref_aug, fixture_data, hratio, wratio):
    import jax.numpy as jnp
    aug = _ours()
    img, mask, hcoords = fixture_data
    ref_img, ref_mask, ref_hc = ref_aug.crop_or_padding(
        img.copy(), mask.copy(), hcoords.copy(), hratio, wratio)

    out_img, out_mask, out_kp = aug.crop_or_padding(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(mask)[None],
        jnp.asarray(hcoords[:, :2])[None], hratio, wratio)
    assert np.asarray(out_img)[0].shape == ref_img.shape
    np.testing.assert_array_equal(np.asarray(out_img)[0], ref_img)
    np.testing.assert_array_equal(np.asarray(out_mask)[0], ref_mask)
    np.testing.assert_allclose(np.asarray(out_kp)[0], ref_hc[:, :2],
                               atol=1e-4)


def test_add_noise_gaussian(ref_aug, fixture_data, monkeypatch):
    import jax.numpy as jnp
    aug = _ours()
    img, _, _ = fixture_data
    h, w = img.shape[:2]
    rng = np.random.default_rng(11)
    gauss = rng.normal(size=(h, w)).astype(np.float64)
    var_u = 0.14
    _FakeRandom(monkeypatch, rand=[0.4, var_u], randn=gauss)
    ref_out = ref_aug.add_noise(img.copy())

    sigma = np.sqrt(var_u * 0.3 * 256.0)
    out = aug.add_gaussian_noise(jnp.asarray(img, jnp.float32)[None],
                                 jnp.asarray(sigma * gauss,
                                             jnp.float32)[None])
    # f32 noise vs the reference's f64 can straddle a truncation boundary
    np.testing.assert_allclose(np.asarray(out)[0],
                               ref_out.astype(np.float32), atol=1.0)


@pytest.mark.parametrize('size_idx,direction', [(2, 0.3), (5, 0.7)])
def test_add_noise_motion_blur(ref_aug, fixture_data, monkeypatch,
                               size_idx, direction):
    import jax.numpy as jnp
    aug = _ours()
    img, _, _ = fixture_data
    sizes = [3, 5, 7, 9, 11, 15]
    _FakeRandom(monkeypatch, rand=[0.95, direction], randint=[size_idx])
    ref_out = ref_aug.add_noise(img.copy())

    out = aug.motion_blur(jnp.asarray(img, jnp.float32)[None],
                          jnp.asarray([sizes[size_idx]]),
                          jnp.asarray([direction < 0.5]))
    np.testing.assert_allclose(np.asarray(out)[0],
                               ref_out.astype(np.float32), atol=1.0)
