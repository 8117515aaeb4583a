"""Camera model and projection geometry for the SPEED pipeline.

TPU-native re-design of the reference SPEED starter-kit camera utilities
(reference: utils.py:24-120) and the axis-angle helpers scattered through
pnp.py:21-30 / demo.py:263-275.  Everything here is pure JAX, fully batched,
and jit/vmap/grad friendly: no scalar Python loops, static shapes only.

Conventions
-----------
* Quaternions are scalar-first ``(w, x, y, z)`` — the SPEED competition
  convention (reference: demo.py:303 builds ``[q3[3], q3[0], q3[1], q3[2]]``).
* ``quat_to_rotmat(q)`` returns the *active* rotation matrix ``R`` such that
  ``x_cam = R @ x_body + t``.  The reference's ``utils.quat2dcm`` (utils.py:68)
  returns the transpose of this matrix (a passive DCM); ``quat_to_dcm`` is
  provided for exact parity with that function.
* All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.core import linalg

# --- SPEED camera constants (reference: utils.py:24-39) ---------------------
SPEED_FX_M = 0.0176          # focal length [m]
SPEED_FY_M = 0.0176
SPEED_NU = 1920              # horizontal pixels
SPEED_NV = 1200              # vertical pixels
SPEED_PPX = 5.86e-6          # pixel pitch [m/pixel]
SPEED_FPX = SPEED_FX_M / SPEED_PPX   # ≈ 3003.413 px
SPEED_FPY = SPEED_FY_M / SPEED_PPX

SPEED_K = np.array(
    [[SPEED_FPX, 0.0, SPEED_NU / 2],
     [0.0, SPEED_FPY, SPEED_NV / 2],
     [0.0, 0.0, 1.0]],
    dtype=np.float64,
)

# LINEMOD camera (reference: pnp.py:8-10); kept for the PVNet path.
LINEMOD_K = np.array(
    [[572.4114, 0.0, 325.2611],
     [0.0, 573.57043, 242.04899],
     [0.0, 0.0, 1.0]],
    dtype=np.float64,
)


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm. q: (..., 4)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) -> active rotation matrix R, batched.

    ``x_cam = R @ x_body``.  Matches ``scipy.spatial.transform.Rotation
    .from_quat([x,y,z,w]).as_matrix()``.
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [jnp.stack([r00, r01, r02], axis=-1),
         jnp.stack([r10, r11, r12], axis=-1),
         jnp.stack([r20, r21, r22], axis=-1)],
        axis=-2,
    )


def quat_to_dcm(q: jnp.ndarray) -> jnp.ndarray:
    """Passive DCM — exact parity with the reference ``quat2dcm`` (utils.py:68-95).

    ``quat_to_dcm(q) == quat_to_rotmat(q).T`` (batched transpose).
    """
    return jnp.swapaxes(quat_to_rotmat(q), -1, -2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z), batched, branch-free.

    Uses the numerically stable 4-candidate construction (selects the
    largest-pivot candidate with ``where`` so it jits with static shapes).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (un-normalized), one per pivot.
    qw0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.where(best == 0, qw0,
                  jnp.where(best == 1, qx0,
                            jnp.where(best == 2, qy0, qz0)))
    q = normalize_quat(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> rotation matrix (cv2.Rodrigues forward), batched.

    Replaces the reference's cv2.Rodrigues calls (demo.py:263, val.py:197)
    and the hand-rolled ``rotate`` (pnp.py:21-30).  Taylor-safe at theta=0.
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    safe_theta = jnp.where(small, 1.0, theta)
    k = rvec / safe_theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [jnp.stack([zero, -kz, ky], axis=-1),
         jnp.stack([kz, zero, -kx], axis=-1),
         jnp.stack([-ky, kx, zero], axis=-1)],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th) * K + (1 - jnp.cos(th)) * linalg.matmul(K, K)
    # theta -> 0 limit: I + K*theta  (K here holds rvec/theta, so K*theta==[rvec]_x)
    R_small = eye + th * K
    return jnp.where(small[..., None], R_small, R)


def rotmat_to_rvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle (cv2.Rodrigues inverse), batched.

    Goes through the quaternion for numerical robustness near theta=0 and pi.
    """
    q = rotmat_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vnorm[..., 0], w)
    axis = v / jnp.where(vnorm < 1e-12, 1.0, vnorm)
    return axis * theta[..., None]


def project_points(points_3d: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   K: jnp.ndarray) -> jnp.ndarray:
    """Project body-frame 3D points to pixel coordinates.

    points_3d: (..., N, 3);  R: (..., 3, 3);  t: (..., 3);  K: (3, 3) or
    broadcastable.  Returns (..., N, 2).  Replaces ``Projector.project``
    (reference: evaluation.py:172-227) and ``utils.project`` (utils.py:98-120).
    """
    p_cam = linalg.einsum('...ij,...nj->...ni', R, points_3d) + t[..., None, :]
    z = p_cam[..., 2:3]
    xy = p_cam[..., :2] / z
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = fx[..., None] * xy[..., 0] + cx[..., None]
    v = fy[..., None] * xy[..., 1] + cy[..., None]
    return jnp.stack([u, v], axis=-1)


def project_axes(q: jnp.ndarray, r: jnp.ndarray,
                 K: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project the body axes for visualization (reference: utils.py:98-120)."""
    if K is None:
        K = jnp.asarray(SPEED_K, dtype=jnp.float32)
    p_axes = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       dtype=jnp.float32)
    R = quat_to_rotmat(q)
    uv = project_points(p_axes, R, r, K)
    return uv[..., 0], uv[..., 1]


def pose_to_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[R|t] 3x4 pose matrix (the reference's ``pose_pred`` layout, pnp.py:90)."""
    return jnp.concatenate([R, t[..., :, None]], axis=-1)
