"""Capture-condition robustness plumbing (keypoint-net axis).

The detector's robustness story (cli/train_detector --augment) got its
own measured table in round 4; these tests pin the shared transform and
the keypoint-net training/eval wiring added for the same axis:

* ``data/augment.py:perturb_capture`` — exposure shift + noise-or-blur
  coin (the reference augmentation library's add_noise semantics,
  augmentation.py:207-233, behind a per-sample exposure stage);
* ``--augment-photo`` target invariance: photometric augmentation must
  perturb ONLY the imagery — heatmap/weight targets and keypoint
  geometry are untouched (unlike --augment-geom, which moves both);
* ``parallel/distributed.py:compile_aligned`` — single-process
  passthrough (the multi-process path is proven end-to-end by
  tests/test_distributed.py::TestTwoProcessTraining).
"""

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.data import synthetic
from esa_pose_estimation_tpu.data.augment import perturb_capture


class TestPerturbCapture:
    def test_shape_range_and_determinism(self):
        key = jax.random.PRNGKey(3)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 48, 64),
                                  minval=0.0, maxval=255.0)
        out = perturb_capture(key, imgs)
        assert out.shape == imgs.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
        # same key -> identical; the probe and the training regularizer
        # must be reproducible
        again = perturb_capture(key, imgs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(again))
        # and it actually perturbs
        assert float(jnp.abs(out - imgs).max()) > 1.0

    def test_channelled_input(self):
        key = jax.random.PRNGKey(5)
        imgs = jnp.full((2, 16, 16, 3), 128.0)
        out = perturb_capture(key, imgs)
        assert out.shape == imgs.shape
        assert bool(jnp.isfinite(out).all())


class TestAugmentPhotoTargets:
    def test_targets_invariant_imagery_perturbed(self):
        """--augment-photo must change the input pixels and NOTHING
        else: identical keys give identical heatmaps/weights/keypoints
        whether or not the photometric stage runs."""
        pts = synthetic.spacecraft_points(8)
        key = jax.random.PRNGKey(11)
        clean = synthetic.make_batch(key, 4, pts, crop_size=64)
        aug = synthetic.make_batch(key, 4, pts, crop_size=64,
                                   augment_photo=True)
        np.testing.assert_array_equal(np.asarray(clean['heatmaps']),
                                      np.asarray(aug['heatmaps']))
        np.testing.assert_array_equal(np.asarray(clean['weights']),
                                      np.asarray(aug['weights']))
        np.testing.assert_array_equal(np.asarray(clean['keypoints_crop']),
                                      np.asarray(aug['keypoints_crop']))
        assert float(jnp.abs(clean['image'] - aug['image']).max()) > 1e-3
        assert bool(jnp.isfinite(aug['image']).all())

    def test_build_batch_from_crops_photo(self):
        from esa_pose_estimation_tpu.data.pipeline import (
            build_batch_from_crops)
        key = jax.random.PRNGKey(2)
        crops = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64),
                                   minval=0.0, maxval=255.0)
        rates = jnp.full((3,), 0.5)
        origins = jnp.zeros((3, 2))
        kps = jax.random.uniform(jax.random.PRNGKey(4), (3, 8, 2),
                                 minval=0.0, maxval=120.0)
        clean = build_batch_from_crops(crops, rates, origins, kps, key)
        aug = build_batch_from_crops(crops, rates, origins, kps, key,
                                     augment_photo=True)
        np.testing.assert_array_equal(np.asarray(clean['heatmaps']),
                                      np.asarray(aug['heatmaps']))
        assert float(jnp.abs(clean['image'] - aug['image']).max()) > 1e-3


class TestCompileAligned:
    def test_single_process_passthrough(self):
        from esa_pose_estimation_tpu.parallel.distributed import (
            compile_aligned)
        fn = jax.jit(lambda x: x * 2)
        x = jnp.arange(4.0)
        out_fn = compile_aligned(fn, x)
        assert out_fn is fn                     # no AOT, no barrier
        np.testing.assert_array_equal(np.asarray(out_fn(x)),
                                      np.asarray(x * 2))
