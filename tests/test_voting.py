"""RANSAC voting + uncertainty PnP tests.

Follows the reference verification idioms: synthetic direction fields with
known keypoints (the CUDA layer's implicit contract,
ransac_voting_gpu.py:514-598) and the uncertainty-PnP noise experiment
(extend_utils.py:237-288: anisotropic noise + matching covariances must
beat unweighted PnP).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import camera
from esa_pose_estimation_tpu.ops import pnp as pnp_mod
from esa_pose_estimation_tpu.ops import voting

SPEED_K32 = jnp.asarray(camera.SPEED_K, jnp.float32)


def make_field(h, w, keypoints, mask_box, noise=0.0, seed=0):
    """Synthetic PVNet training target: unit vectors from each foreground
    pixel toward each keypoint."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    pix = np.stack([xs, ys], -1).reshape(-1, 2)
    k = len(keypoints)
    d = keypoints[None, :, :] - pix[:, None, :]
    d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    if noise:
        ang = rng.normal(scale=noise, size=d.shape[:-1])
        ca, sa = np.cos(ang), np.sin(ang)
        d = np.stack([ca * d[..., 0] - sa * d[..., 1],
                      sa * d[..., 0] + ca * d[..., 1]], axis=-1)
    mask = np.zeros((h, w), np.float32)
    x0, y0, x1, y1 = mask_box
    mask[y0:y1, x0:x1] = 1.0
    return (jnp.asarray(mask[None]),
            jnp.asarray(d.reshape(1, h, w, k, 2), jnp.float32))


class TestRansacVoting:
    def test_recovers_exact_keypoints(self):
        kps = np.array([[40.0, 25.0], [12.5, 50.25], [60.0, 10.0]],
                       np.float32)
        mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60))
        res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(res.keypoints[0]), kps,
                                   atol=0.1)
        assert (np.asarray(res.inlier_counts) > 100).all()

    def test_keypoint_outside_mask(self):
        # keypoints can project outside the object mask (occluded corners)
        kps = np.array([[70.0, 70.0]], np.float32)
        mask, vertex = make_field(64, 64, kps, (5, 5, 40, 40))
        res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(res.keypoints[0]), kps,
                                   atol=0.2)

    def test_noisy_field(self):
        kps = np.array([[30.0, 30.0], [45.0, 20.0]], np.float32)
        mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60), noise=0.03)
        res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(2))
        err = np.linalg.norm(np.asarray(res.keypoints[0]) - kps, axis=-1)
        assert err.max() < 1.5, err

    def test_covariance_scales_with_noise(self):
        kps = np.array([[32.0, 32.0]], np.float32)
        covs = []
        for noise in (0.01, 0.1):
            mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60),
                                      noise=noise, seed=3)
            res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(3))
            covs.append(float(jnp.trace(res.covariance[0, 0])))
        assert covs[1] > covs[0] * 3

    def test_empty_mask_finite(self):
        kps = np.array([[32.0, 32.0]], np.float32)
        _, vertex = make_field(64, 64, kps, (0, 0, 1, 1))
        mask = jnp.zeros((1, 64, 64))
        res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(4))
        assert np.isfinite(np.asarray(res.keypoints)).all()


def _np_distribution_with_mean(hyp, ratio, mean):
    """Numpy transcription of reference ransac_voting_gpu.py:392-401."""
    b, hn, k, _ = hyp.shape
    cov = np.zeros((b, k, 2, 2), np.float64)
    for bi in range(b):
        for ki in range(k):
            r = ratio[bi, :, ki].astype(np.float64).copy()
            thresh = r.max() - 0.1
            r[r < thresh] = 0.0
            dev = hyp[bi, :, ki].astype(np.float64) - mean[bi, ki]
            cov[bi, ki] = (r[:, None, None] *
                           (dev[:, :, None] * dev[:, None, :])).sum(0)
            cov[bi, ki] /= r.sum() + 1e-3
    return cov


def _np_distribution_topk(hyp, ratio, topk):
    """Numpy transcription of reference ransac_voting_gpu.py:318-331."""
    b, hn, k, _ = hyp.shape
    mean = np.zeros((b, k, 2), np.float64)
    cov = np.zeros((b, k, 2, 2), np.float64)
    for bi in range(b):
        for ki in range(k):
            r = ratio[bi, :, ki].astype(np.float64).copy()
            kth = np.sort(r)[::-1][min(topk, hn) - 1]
            r[r < kth] = 0.0
            rs = r.sum() + 1e-9
            mean[bi, ki] = (r[:, None] * hyp[bi, :, ki]).sum(0) / rs
            dev = hyp[bi, :, ki].astype(np.float64) - mean[bi, ki]
            cov[bi, ki] = (r[:, None, None] *
                           (dev[:, :, None] * dev[:, None, :])).sum(0) / rs
    return mean, cov


class TestVotingDistribution:
    def test_moments_with_mean_golden(self):
        rng = np.random.default_rng(11)
        hyp = rng.normal(32.0, 4.0, (2, 40, 3, 2)).astype(np.float32)
        ratio = rng.uniform(0.0, 1.0, (2, 40, 3)).astype(np.float32)
        mean = rng.normal(32.0, 1.0, (2, 3, 2)).astype(np.float32)
        got = np.asarray(voting.distribution_moments_with_mean(
            jnp.asarray(hyp), jnp.asarray(ratio), jnp.asarray(mean)))
        want = _np_distribution_with_mean(hyp, ratio, mean)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_moments_topk_golden(self):
        rng = np.random.default_rng(12)
        hyp = rng.normal(32.0, 4.0, (1, 60, 2, 2)).astype(np.float32)
        # distinct ratios so the k-th threshold is unambiguous
        ratio = rng.permutation(60 * 2).reshape(60, 2)[None] / 120.0
        ratio = ratio.astype(np.float32)
        gm, gc = voting.distribution_moments(
            jnp.asarray(hyp), jnp.asarray(ratio), topk=16)
        wm, wc = _np_distribution_topk(hyp, ratio, 16)
        np.testing.assert_allclose(np.asarray(gm), wm, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gc), wc, rtol=1e-3, atol=1e-4)

    def test_with_mean_returns_given_mean(self):
        kps = np.array([[30.0, 30.0], [45.0, 20.0]], np.float32)
        mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60), noise=0.02)
        given = jnp.asarray(kps[None] + 0.25)
        mean, cov = voting.estimate_voting_distribution_with_mean(
            mask, vertex, given, jax.random.PRNGKey(8), n_hypotheses=256)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(given))
        c = np.asarray(cov)
        assert np.isfinite(c).all()
        # symmetric PSD-ish covariance
        np.testing.assert_allclose(c[..., 0, 1], c[..., 1, 0], atol=1e-4)
        assert (c[..., 0, 0] >= 0).all() and (c[..., 1, 1] >= 0).all()

    def test_with_mean_cov_scales_with_noise(self):
        kps = np.array([[32.0, 32.0]], np.float32)
        traces = []
        for noise in (0.01, 0.1):
            mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60),
                                      noise=noise, seed=4)
            res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(9))
            _, cov = voting.estimate_voting_distribution_with_mean(
                mask, vertex, res.keypoints, jax.random.PRNGKey(10),
                n_hypotheses=256)
            traces.append(float(jnp.trace(cov[0, 0])))
        assert traces[1] > traces[0] * 3, traces

    def test_estimate_distribution_recovers_keypoints(self):
        kps = np.array([[30.0, 30.0], [45.0, 20.0]], np.float32)
        mask, vertex = make_field(64, 64, kps, (5, 5, 60, 60), noise=0.01)
        mean, cov = voting.estimate_voting_distribution(
            mask, vertex, jax.random.PRNGKey(11), n_hypotheses=512)
        np.testing.assert_allclose(np.asarray(mean[0]), kps, atol=1.0)
        assert np.isfinite(np.asarray(cov)).all()


class TestReferenceScale:
    """The voting layer must run at the reference PVNet operating point
    (128x128 crop, K=32 keypoints, Hyp>=128; VERDICT round-1 weak #2) in
    bounded memory: the chunked scan holds one (B, chunk, N, K, 2) block
    at a time instead of the 17 GB (B, Hyp, H*W, K, 2) tensor."""

    def test_reference_shapes_run(self):
        k = 32
        rng = np.random.default_rng(13)
        kps = rng.uniform(20, 100, (k, 2)).astype(np.float32)
        mask, vertex = make_field(128, 128, kps, (10, 10, 118, 118),
                                  noise=0.01, seed=5)
        res = voting.ransac_voting(mask, vertex, jax.random.PRNGKey(12),
                                   n_hypotheses=128)
        err = np.linalg.norm(np.asarray(res.keypoints[0]) - kps, axis=-1)
        assert err.max() < 2.0, err
        _, cov = voting.estimate_voting_distribution_with_mean(
            mask, vertex, res.keypoints, jax.random.PRNGKey(13),
            n_hypotheses=512)
        assert np.isfinite(np.asarray(cov)).all()


class TestUncertaintyPnP:
    def test_beats_unweighted_under_anisotropic_noise(self):
        # extend_utils.py:237-288 idiom: corrupt a subset of keypoints with
        # large anisotropic noise, give the solver matching covariances.
        rng = np.random.default_rng(5)
        p3 = rng.uniform(-0.5, 0.5, (30, 3)).astype(np.float32)
        R_gt = Rot.random(random_state=rng).as_matrix()
        t_gt = np.array([0.1, -0.2, 12.0])
        cam = p3 @ R_gt.T + t_gt
        uv = cam[:, :2] / cam[:, 2:]
        Kk = camera.SPEED_K
        uv = uv * [Kk[0, 0], Kk[1, 1]] + [Kk[0, 2], Kk[1, 2]]

        cov = np.tile(np.eye(2, dtype=np.float32) * 0.25, (30, 1, 1))
        noisy = uv + rng.normal(scale=0.5, size=uv.shape)
        bad = rng.choice(30, size=8, replace=False)
        noisy[bad] += rng.normal(scale=25.0, size=(8, 2))
        cov[bad] = np.eye(2, dtype=np.float32) * 625.0

        R_u, t_u = pnp_mod.uncertainty_pnp(
            jnp.asarray(p3), jnp.asarray(noisy, jnp.float32),
            jnp.asarray(cov), SPEED_K32, jax.random.PRNGKey(6))
        # unweighted: identity covariances
        R_p, t_p = pnp_mod.uncertainty_pnp(
            jnp.asarray(p3), jnp.asarray(noisy, jnp.float32),
            jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (30, 1, 1))),
            SPEED_K32, jax.random.PRNGKey(6))

        def ang(Re):
            return np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(Re) @ R_gt.T) - 1) / 2, -1, 1)))

        t_err_u = np.linalg.norm(np.asarray(t_u) - t_gt)
        t_err_p = np.linalg.norm(np.asarray(t_p) - t_gt)
        assert t_err_u <= t_err_p * 1.05
        assert t_err_u < 0.05, (t_err_u, t_err_p)
        assert ang(R_u) < 0.5

    def test_cov_to_weight_identity(self):
        W = pnp_mod.cov_to_weight(jnp.eye(2)[None] * 4.0, eps=0.0)
        np.testing.assert_allclose(np.asarray(W[0]), np.eye(2) * 0.5,
                                   atol=1e-5)

    def test_cov_to_weight_inverts_sqrtm(self):
        from scipy.linalg import sqrtm
        rng = np.random.default_rng(7)
        A = rng.normal(size=(2, 2))
        cov = A @ A.T + 0.1 * np.eye(2)
        W = np.asarray(pnp_mod.cov_to_weight(jnp.asarray(cov, jnp.float32),
                                             eps=0.0))
        expected = np.linalg.inv(sqrtm(cov))
        np.testing.assert_allclose(W, expected, rtol=1e-3, atol=1e-4)


class TestVotingVariants:
    """Motion / center / vanishing-point variants
    (ransac_voting_gpu.py:408-511, 600-668, 960-981)."""

    def _field_to(self, targets, h, w, unit=True):
        """(K, 2) targets -> mask (1,H,W) + direction field (1,H,W,K,2)."""
        ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing='ij')
        grid = np.stack([xs, ys], -1)                       # (H, W, 2)
        d = targets[None, None] - grid[:, :, None]          # (H, W, K, 2)
        if unit:
            d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
        mask = np.ones((1, h, w), np.float32)
        return jnp.asarray(mask), jnp.asarray(d[None])

    def test_motion_voting_exact_and_empty(self):
        from esa_pose_estimation_tpu.ops.voting import motion_voting
        targets = np.array([[5.5, 9.25], [12.0, 3.0]], np.float32)
        mask, offsets = self._field_to(targets, 16, 16, unit=False)
        got = motion_voting(mask, offsets)
        np.testing.assert_allclose(np.asarray(got)[0], targets, atol=1e-4)
        empty = motion_voting(jnp.zeros_like(mask), offsets)
        np.testing.assert_allclose(np.asarray(empty), 0.0)
        # soft masks (documented contract: values in [0, 1]) must be
        # mean-normalized by the actual weight sum — a maximum(wsum, 1.0)
        # floor used to shrink the estimate when total weight < 1
        soft = mask * (0.5 / float(np.asarray(mask).sum()))  # wsum = 0.5
        got_soft = motion_voting(soft, offsets)
        np.testing.assert_allclose(np.asarray(got_soft)[0], targets,
                                   atol=1e-4)

    def test_center_voting_recovers_center(self):
        from esa_pose_estimation_tpu.ops.voting import ransac_voting_center
        center = np.array([[11.0, 6.0]], np.float32)
        mask, d = self._field_to(center, 20, 20)
        res = ransac_voting_center(mask, d[:, :, :, 0], jax.random.PRNGKey(0),
                                   n_points=256)
        np.testing.assert_allclose(np.asarray(res.center)[0], center[0],
                                   atol=0.5)
        # nearly every foreground pixel voted for the true center
        assert float(res.inlier_ratio[0]) > 0.9
        assert res.inlier_mask.shape == (1, 20, 20)

    def test_vanishing_point_finite(self):
        from esa_pose_estimation_tpu.ops.voting import vanishing_point_voting
        targets = np.array([[9.0, 13.0]], np.float32)
        mask, d = self._field_to(targets, 24, 24)
        win = np.asarray(vanishing_point_voting(mask, d,
                                                jax.random.PRNGKey(1),
                                                n_points=256))[0, 0]
        # dehomogenize: finite point recovered
        assert abs(win[2]) > 1e-3
        np.testing.assert_allclose(win[:2] / win[2], targets[0], atol=0.5)

    def test_vanishing_point_at_infinity(self):
        from esa_pose_estimation_tpu.ops.voting import vanishing_point_voting
        # perfectly parallel field: the vanishing point is at infinity
        h = w = 24
        direction = np.array([0.6, 0.8], np.float32)
        d = np.tile(direction, (1, h, w, 1, 1))
        mask = jnp.ones((1, h, w), jnp.float32)
        win = np.asarray(vanishing_point_voting(
            jnp.asarray(mask), jnp.asarray(d), jax.random.PRNGKey(2),
            n_points=256))[0, 0]
        # homogeneous w-component ~ 0, xy parallel to the field direction
        assert abs(win[2]) < 0.05
        xy = win[:2] / np.linalg.norm(win[:2])
        assert abs(float(np.dot(xy, direction))) > 0.999
