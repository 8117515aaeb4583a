"""Per-dataset camera registry + projection.

Replaces the reference's ``Projector`` (evaluation.py:172-227 /
lib/utils/base_utils.py) which hardcodes intrinsics (and filesystem paths)
per dataset name.  Here it is a plain registry over the batched projection
op in core/camera.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from esa_pose_estimation_tpu.core import camera

# Named intrinsics (reference: evaluation.py:172-227 'linemod'/'blender'/...
# plus the SPEED camera from utils.py:24-39).
CAMERAS: dict[str, np.ndarray] = {
    'esa': camera.SPEED_K,
    'speed': camera.SPEED_K,
    'linemod': camera.LINEMOD_K,
    'blender': np.array([[700.0, 0.0, 320.0],
                         [0.0, 700.0, 240.0],
                         [0.0, 0.0, 1.0]]),
}


def register_camera(name: str, K: np.ndarray) -> None:
    CAMERAS[name] = np.asarray(K, np.float64)


class Projector:
    """``Projector.project(pts, RT, 'esa')`` parity (demo.py:279-282)."""

    def intrinsics(self, camera_type: str) -> np.ndarray:
        return CAMERAS[camera_type]

    def project(self, points_3d, pose, camera_type: str):
        """points_3d: (N, 3); pose: (3, 4) [R|t] -> (N, 2) pixels."""
        K = jnp.asarray(CAMERAS[camera_type], jnp.float32)
        pose = jnp.asarray(pose, jnp.float32)
        uv = camera.project_points(jnp.asarray(points_3d, jnp.float32),
                                   pose[..., :3, :3], pose[..., :3, 3], K)
        return np.asarray(uv)
