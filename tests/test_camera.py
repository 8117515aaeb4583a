"""Geometry core tests: quaternions, Rodrigues, projection.

Validated against scipy.spatial.transform.Rotation (the same library the
reference uses at demo.py:301-303) and the reference quat2dcm semantics
(utils.py:68-95).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from esa_pose_estimation_tpu.core import camera


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuat:
    def test_quat_to_rotmat_matches_scipy(self):
        q = random_quats(64)
        ours = np.asarray(camera.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        # scipy takes (x,y,z,w)
        theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quat_to_dcm_is_transpose(self):
        q = jnp.asarray(random_quats(8), jnp.float32)
        dcm = camera.quat_to_dcm(q)
        rot = camera.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(dcm),
                                   np.asarray(jnp.swapaxes(rot, -1, -2)),
                                   atol=1e-7)

    def test_rotmat_quat_roundtrip(self):
        q = random_quats(256, seed=3)
        q *= np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
        Rm = camera.quat_to_rotmat(jnp.asarray(q, jnp.float32))
        q2 = np.asarray(camera.rotmat_to_quat(Rm))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_reference_quat2dcm_value(self):
        # Reference implementation transcribed numerically (utils.py:68-95).
        q = np.array([0.5, 0.5, 0.5, 0.5])
        dcm = np.asarray(camera.quat_to_dcm(jnp.asarray(q, jnp.float32)))
        expected = np.array([[0.0, 1, 0], [0, 0, 1], [1, 0, 0]])
        np.testing.assert_allclose(dcm, expected, atol=1e-6)


class TestRodrigues:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        rvec = rng.normal(size=(128, 3)) * 2.0
        Rm = camera.rodrigues(jnp.asarray(rvec, jnp.float32))
        theirs = R.from_rotvec(rvec).as_matrix()
        np.testing.assert_allclose(np.asarray(Rm), theirs, atol=1e-5)
        back = np.asarray(camera.rotmat_to_rvec(Rm))
        # axis-angle is unique up to 2*pi; our angles are in [0, pi]
        theirs_back = R.from_matrix(theirs).as_rotvec()
        np.testing.assert_allclose(back, theirs_back, atol=1e-4)

    def test_zero_rotation(self):
        Rm = camera.rodrigues(jnp.zeros((3,), jnp.float32))
        np.testing.assert_allclose(np.asarray(Rm), np.eye(3), atol=1e-7)
        rv = camera.rotmat_to_rvec(jnp.eye(3, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(rv), np.zeros(3), atol=1e-6)

    def test_grad_flows(self):
        def f(rv):
            return jnp.sum(camera.rodrigues(rv) ** 2)

        g = jax.grad(f)(jnp.array([0.1, -0.2, 0.3], jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


class TestProjection:
    def test_identity_pose_center(self):
        K = jnp.asarray(camera.SPEED_K, jnp.float32)
        pts = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
        uv = camera.project_points(pts, jnp.eye(3, dtype=jnp.float32),
                                   jnp.zeros(3, jnp.float32), K)
        np.testing.assert_allclose(np.asarray(uv[0]), [960.0, 600.0], atol=1e-4)

    def test_speed_focal_length(self):
        assert camera.SPEED_K[0, 0] == pytest.approx(3003.41296928, abs=1e-5)

    def test_batched_projection_matches_loop(self):
        rng = np.random.default_rng(2)
        B, N = 4, 11
        q = random_quats(B, seed=5)
        t = rng.normal(size=(B, 3)) + np.array([0, 0, 10.0])
        pts = rng.normal(size=(B, N, 3))
        K = camera.SPEED_K
        Rm = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        expected = np.zeros((B, N, 2))
        for b in range(B):
            pc = pts[b] @ Rm[b].T + t[b]
            pc = pc / pc[:, 2:3]
            uvw = pc @ K.T
            expected[b] = uvw[:, :2]
        ours = camera.project_points(
            jnp.asarray(pts, jnp.float32),
            camera.quat_to_rotmat(jnp.asarray(q, jnp.float32)),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(K, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4, atol=2e-2)
