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
