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


@partial(jax.jit, static_argnames=('height', 'width', 'chunk'))
def rasterize_color(vertices: jnp.ndarray, faces: jnp.ndarray,
                    R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray,
                    height: int, width: int,
                    vertex_colors: jnp.ndarray | None = None,
                    light_dir: tuple[float, float, float] = (0.0, 0.0, -1.0),
                    ambient: float = 0.35, chunk: int = 128
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Color + depth render of a triangle mesh under a calibrated camera —
    the role of the reference's OpenGL color renderer that generates
    synthetic LINEMOD appearance (opengl_render_backend.py:165-392 and the
    Renderer driver, render_utils.py:161-274), as a jittable z-buffered
    scan over triangle chunks.

    vertices: (V, 3); faces: (F, 3) int32; vertex_colors: (V, 3) in [0, 1]
    (defaults to light gray).  Gouraud-style barycentric color
    interpolation with Lambertian shading from camera-frame face normals:
    ``shade = ambient + (1-ambient) * max(0, -n . l)``.

    Returns (rgb (H, W, 3) f32 in [0, 1] — black background, depth (H, W)
    f32 (+inf empty), mask (H, W) bool).
    """
    if vertex_colors is None:
        vertex_colors = jnp.full(vertices.shape, 0.8, jnp.float32)
    uv = project_points(vertices, R, t, K)
    cam = jnp.einsum('ij,nj->ni', R, vertices) + t          # (V, 3)
    z = cam[:, 2]

    f = faces.shape[0]
    pad = (-f) % chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], 0)
    valid_tri = jnp.concatenate(
        [jnp.ones((f,), bool), jnp.zeros((pad,), bool)])
    n_chunks = faces_p.shape[0] // chunk

    p = height * width
    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :],
                          (height, width)).reshape(-1)
    py = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None],
                          (height, width)).reshape(-1)
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)
    arange_p = jnp.arange(p)

    def edge(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    def body(carry, inputs):
        depth, color = carry
        tri, tv = inputs
        ia, ib, ic = tri[:, 0], tri[:, 1], tri[:, 2]
        a, b, c = uv[ia], uv[ib], uv[ic]
        area = edge(a[:, 0], a[:, 1], b[:, 0], b[:, 1], c[:, 0], c[:, 1])
        sa = jnp.where(area == 0, 1.0, jnp.sign(area))
        w0 = edge(b[:, 0, None], b[:, 1, None], c[:, 0, None],
                  c[:, 1, None], px[None], py[None]) * sa[:, None]
        w1 = edge(c[:, 0, None], c[:, 1, None], a[:, 0, None],
                  a[:, 1, None], px[None], py[None]) * sa[:, None]
        w2 = edge(a[:, 0, None], a[:, 1, None], b[:, 0, None],
                  b[:, 1, None], px[None], py[None]) * sa[:, None]
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (area != 0)[:, None] & tv[:, None])
        denom = jnp.maximum(jnp.abs(area), 1e-12)[:, None]
        zint = (w0 * z[ia][:, None] + w1 * z[ib][:, None]
                + w2 * z[ic][:, None]) / denom
        tri_depth = jnp.where(inside, zint, jnp.inf)      # (chunk, P)

        win = jnp.argmin(tri_depth, axis=0)               # (P,)
        win_depth = tri_depth[win, arange_p]
        # interpolate color only for the winning triangle per pixel
        bw = jnp.stack([w0[win, arange_p], w1[win, arange_p],
                        w2[win, arange_p]], axis=-1) / denom[win]
        vcol = jnp.stack([vertex_colors[ia][win],
                          vertex_colors[ib][win],
                          vertex_colors[ic][win]], axis=1)  # (P, 3v, 3c)
        col = jnp.einsum('pv,pvc->pc', bw, vcol)
        # Lambertian shade from the camera-frame face normal
        e1 = cam[ib] - cam[ia]
        e2 = cam[ic] - cam[ia]
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-12)
        ndotl = jnp.abs(jnp.einsum('fc,c->f', n, light))[win]  # (P,)
        col = col * (ambient + (1.0 - ambient) * ndotl)[:, None]

        better = win_depth < depth
        return (jnp.where(better, win_depth, depth),
                jnp.where(better[:, None], col, color)), None

    depth0 = jnp.full((p,), jnp.inf)
    color0 = jnp.zeros((p, 3), jnp.float32)
    (depth, color), _ = jax.lax.scan(
        body, (depth0, color0),
        (faces_p.reshape(n_chunks, chunk, 3),
         valid_tri.reshape(n_chunks, chunk)))
    mask = jnp.isfinite(depth)
    return (color.reshape(height, width, 3),
            depth.reshape(height, width),
            mask.reshape(height, width))


def render_color(vertices, faces, pose, K, height, width,
                 vertex_colors=None) -> np.ndarray:
    """uint8 convenience wrapper: (H, W, 3) rendered appearance
    (opengl_render_backend.py render() role).  pose: (3, 4) [R|t]."""
    pose = jnp.asarray(pose, jnp.float32)
    vc = None if vertex_colors is None else jnp.asarray(vertex_colors,
                                                        jnp.float32)
    rgb, _, _ = rasterize_color(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32),
        pose[:, :3], pose[:, 3], jnp.asarray(K, jnp.float32),
        height, width, vc)
    return np.asarray(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)
