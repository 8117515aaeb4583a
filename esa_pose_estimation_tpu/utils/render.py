"""Offline data-generation tooling: viewpoint sampling + mesh rasterization.

TPU-native replacement for the reference's offline render stack
(SURVEY §2 #27):

* viewpoint / pose sampling — reference lib/utils/render_utils.py:16-121
  (pose-distribution statistics and uniform sphere sampling used to drive
  the Blender synthetic-data renderer);
* binary mask rasterization — reference
  lib/utils/extend_utils/src/mesh_rasterization.cpp:1-74 (CPU triangle
  fill), re-expressed as a batched edge-function test that jits and runs
  on device (chunked over triangles to bound memory);
* depth rasterization — the z-buffer variant
  (opengl_render_backend.py:165-392 role for depth supervision).

Blender-subprocess orchestration itself is out of scope (host tooling, no
Blender in the image); everything that was geometry math is here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.core.camera import project_points


def sample_sphere_points(n: int, seed: int = 0) -> np.ndarray:
    """n approximately-uniform unit-sphere points (Fibonacci spiral —
    deterministic version of render_utils' sphere sampling)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5 ** 0.5)
    theta = golden * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], axis=-1)


def sample_poses(n: int, min_dist: float, max_dist: float,
                 seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Random viewpoints: (azimuth-elevation derived rotations (n, 3, 3),
    translations (n, 3)) — the pose sampler role of render_utils.py:16-121.
    """
    rng = np.random.default_rng(seed)
    views = sample_sphere_points(n, seed)
    rng.shuffle(views)
    ups = rng.normal(size=(n, 3))
    Rs = np.zeros((n, 3, 3))
    for i in range(n):
        z = -views[i]
        z = z / np.linalg.norm(z)
        x = np.cross(ups[i], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        Rs[i] = np.stack([x, y, z])
    dists = rng.uniform(min_dist, max_dist, size=n)
    ts = np.stack([np.zeros(n), np.zeros(n), dists], axis=-1)
    return Rs, ts


def pose_statistics(Rs: np.ndarray, ts: np.ndarray) -> dict[str, np.ndarray]:
    """Summary statistics of a pose set (azimuth/elevation/distance
    histogsom inputs — render_utils pose-statistics role)."""
    z_axis = Rs[:, 2, :]
    elevation = np.degrees(np.arcsin(np.clip(z_axis[:, 2], -1, 1)))
    azimuth = np.degrees(np.arctan2(z_axis[:, 1], z_axis[:, 0]))
    dist = np.linalg.norm(ts, axis=-1)
    return {'azimuth': azimuth, 'elevation': elevation, 'distance': dist}


@partial(jax.jit, static_argnames=('height', 'width', 'chunk'))
def rasterize(vertices: jnp.ndarray, faces: jnp.ndarray, R: jnp.ndarray,
              t: jnp.ndarray, K: jnp.ndarray, height: int, width: int,
              chunk: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize a triangle mesh under a pose.

    vertices: (V, 3); faces: (F, 3) int32; returns (mask (H, W) bool,
    depth (H, W) f32 with +inf where empty).  Edge-function coverage test
    vectorized over pixels, scanned over triangle chunks.
    """
    uv = project_points(vertices, R, t, K)                  # (V, 2)
    z = (jnp.einsum('ij,nj->ni', R, vertices) + t)[:, 2]    # (V,)

    f = faces.shape[0]
    pad = (-f) % chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid_tri = jnp.concatenate(
        [jnp.ones((f,), bool), jnp.zeros((pad,), bool)])
    n_chunks = faces_p.shape[0] // chunk

    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    px = jnp.broadcast_to(xs, (height, width)).reshape(-1)
    py = jnp.broadcast_to(ys, (height, width)).reshape(-1)

    def edge(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    def body(carry, inputs):
        mask, depth = carry
        tri, tv = inputs                                    # (chunk, 3), bool
        a, b, c = uv[tri[:, 0]], uv[tri[:, 1]], uv[tri[:, 2]]
        za, zb, zc = z[tri[:, 0]], z[tri[:, 1]], z[tri[:, 2]]
        area = edge(a[:, 0], a[:, 1], b[:, 0], b[:, 1], c[:, 0], c[:, 1])
        sa = jnp.where(area == 0, 1.0, jnp.sign(area))
        # barycentric numerators per pixel: (chunk, P)
        w0 = edge(b[:, 0, None], b[:, 1, None], c[:, 0, None], c[:, 1, None],
                  px[None], py[None]) * sa[:, None]
        w1 = edge(c[:, 0, None], c[:, 1, None], a[:, 0, None], a[:, 1, None],
                  px[None], py[None]) * sa[:, None]
        w2 = edge(a[:, 0, None], a[:, 1, None], b[:, 0, None], b[:, 1, None],
                  px[None], py[None]) * sa[:, None]
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (area != 0)[:, None] & tv[:, None])
        denom = jnp.maximum(jnp.abs(area), 1e-12)[:, None]
        zint = (w0 * za[:, None] + w1 * zb[:, None] + w2 * zc[:, None]) / denom
        tri_depth = jnp.where(inside, zint, jnp.inf)
        depth = jnp.minimum(depth, jnp.min(tri_depth, axis=0))
        mask = mask | jnp.any(inside, axis=0)
        return (mask, depth), None

    mask0 = jnp.zeros((height * width,), bool)
    depth0 = jnp.full((height * width,), jnp.inf)
    (mask, depth), _ = jax.lax.scan(
        body, (mask0, depth0),
        (faces_p.reshape(n_chunks, chunk, 3),
         valid_tri.reshape(n_chunks, chunk)))
    return mask.reshape(height, width), depth.reshape(height, width)


def rasterize_mask(vertices, faces, pose, K, height, width) -> np.ndarray:
    """Binary-mask convenience wrapper (mesh_rasterization.cpp:1-74 parity,
    extend_utils mesh_binary_rasterization role).  pose: (3, 4) [R|t]."""
    pose = jnp.asarray(pose, jnp.float32)
    mask, _ = rasterize(jnp.asarray(vertices, jnp.float32),
                        jnp.asarray(faces, jnp.int32),
                        pose[:, :3], pose[:, 3],
                        jnp.asarray(K, jnp.float32), height, width)
    return np.asarray(mask)
