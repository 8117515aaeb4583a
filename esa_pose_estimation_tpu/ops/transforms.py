"""Test-time transform utilities (reference: transforms.py:16-122).

The reference carries the HRNet-family affine/flip helpers used for
flip-TTA and letterbox crops: ``flip_back`` (un-flip heatmaps + swap
left/right channel pairs), ``fliplr_joints``, ``get_affine_transform``
(center/scale/rot 3-point affine, the x200 person-bbox convention),
``transform_preds`` and ``crop``.  TPU-native redesign: everything is
batched and jittable — channel swaps are gather permutations, the
3-point affine solve is closed-form, and ``crop`` warps through the
batched ``affine_sample`` resampler instead of per-image cv2.warpAffine.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _pair_permutation(num_joints: int,
                      matched_parts: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Channel permutation swapping each (left, right) pair."""
    perm = list(range(num_joints))
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, jnp.int32)


def flip_back(output_flipped: jnp.ndarray,
              matched_parts: Sequence[Sequence[int]] = ()) -> jnp.ndarray:
    """Un-flip heatmaps predicted on a horizontally flipped input
    (transforms.py:16-30): reverse the width axis and swap the left/right
    joint channels.  output_flipped: (B, K, H, W).

    SPEED's 30 spacecraft keypoints have no mirror-symmetric pairs, so
    ``matched_parts`` defaults empty there; the LINEMOD/kp6d family passes
    its pair list."""
    out = output_flipped[:, :, :, ::-1]
    if matched_parts:
        out = out[:, _pair_permutation(out.shape[1], matched_parts)]
    return out


def fliplr_joints(joints: jnp.ndarray, joints_vis: jnp.ndarray, width: int,
                  matched_parts: Sequence[Sequence[int]] = ()
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flip 2D joints horizontally (transforms.py:33-47), batched.

    joints: (..., K, 2); joints_vis: (..., K, V).  Returns
    (joints * joints_vis-mask, joints_vis) like the reference (invisible
    joints are zeroed by the multiply)."""
    joints = joints.at[..., 0].set(width - joints[..., 0] - 1)
    if matched_parts:
        perm = _pair_permutation(joints.shape[-2], matched_parts)
        joints = joints[..., perm, :]
        joints_vis = joints_vis[..., perm, :]
    return joints * joints_vis[..., :1], joints_vis


def _get_dir(src_point: jnp.ndarray, rot_rad: jnp.ndarray) -> jnp.ndarray:
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack([src_point[0] * cs - src_point[1] * sn,
                      src_point[0] * sn + src_point[1] * cs])


def _get_3rd_point(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    direct = a - b
    return b + jnp.stack([-direct[1], direct[0]])


def _solve_affine(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """2x3 affine mapping three src points to three dst points
    (cv2.getAffineTransform).  src/dst: (3, 2)."""
    A = jnp.concatenate([src, jnp.ones((3, 1), src.dtype)], axis=1)  # (3,3)
    # solve A @ M^T = dst  ->  M = (A^-1 dst)^T
    return jnp.linalg.solve(A, dst).T                                # (2,3)


def get_affine_transform(center, scale, rot, output_size,
                         shift=(0.0, 0.0), inv: bool = False) -> jnp.ndarray:
    """The center/scale/rotation 3-point affine (transforms.py:58-90):
    scale is in the x200-pixel person-box convention; the three
    correspondence points are box center, a point half a box up
    (rotated), and their 90-degree third point.  Returns (2, 3)."""
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.stack([scale, scale])
    shift = jnp.asarray(shift, jnp.float32)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = jnp.asarray(rot, jnp.float32) * (jnp.pi / 180.0)
    src_dir = _get_dir(jnp.stack([jnp.float32(0.0), (src_w - 1) * -0.5]),
                       rot_rad)
    dst_dir = jnp.asarray([0.0, (dst_w - 1) * -0.5], jnp.float32)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    dst0 = jnp.asarray([(dst_w - 1) * 0.5, (dst_h - 1) * 0.5], jnp.float32)
    dst1 = dst0 + dst_dir
    src = jnp.stack([src0, src1, _get_3rd_point(src0, src1)])
    dst = jnp.stack([dst0, dst1, _get_3rd_point(dst0, dst1)])
    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform(pts: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 affine to points (..., 2) (transforms.py:93-96)."""
    return pts @ t[:, :2].T + t[:, 2]


def transform_preds(coords: jnp.ndarray, center, scale,
                    output_size) -> jnp.ndarray:
    """Heatmap-space coords -> original image space via the inverse
    affine (transforms.py:50-55).  coords: (..., K, 2)."""
    trans = get_affine_transform(center, scale, 0.0, output_size, inv=True)
    return affine_transform(coords, trans)


def crop(images: jnp.ndarray, center, scale, output_size,
         rot: float = 0.0) -> jnp.ndarray:
    """Batched transforms.py:114-122 ``crop``: warp images through the
    center/scale/rot affine to (out_h, out_w).  images: (B, H, W[, C]);
    center/scale may be per-batch (B, 2)/(B,) or shared."""
    import jax

    b = images.shape[0]
    center = jnp.asarray(center, jnp.float32)
    if center.ndim == 1:
        center = jnp.broadcast_to(center, (b, 2))
    scale = jnp.asarray(scale, jnp.float32)
    # normalize scale to (B, 2): scalar / shared (2,) pair / per-batch (B,)
    if scale.ndim == 0:
        scale = jnp.full((b, 2), scale)
    elif scale.ndim == 1 and scale.shape[0] == 2:
        scale = jnp.broadcast_to(scale, (b, 2))
    elif scale.ndim == 1:
        scale = jnp.stack([scale, scale], axis=-1)

    def inv_matrix(c, s):
        # warpAffine samples dst pixels through the INVERSE map
        return get_affine_transform(c, s, rot, output_size, inv=True)

    M = jax.vmap(inv_matrix)(center, scale)
    out_w, out_h = int(output_size[0]), int(output_size[1])
    # affine_sample emits the input's spatial size; resample on a padded
    # canvas when output differs
    return affine_sample_sized(images, M, out_h, out_w)


def affine_sample_sized(images: jnp.ndarray, matrices: jnp.ndarray,
                        out_h: int, out_w: int) -> jnp.ndarray:
    """affine_sample generalized to an explicit output size."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    # per-tap zero blending (cv2 BORDER_CONSTANT blends the border pixel
    # with the constant at subpixel boundaries)
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
    M = matrices
    sx = M[:, 0, 0, None, None] * xs + M[:, 0, 1, None, None] * ys \
        + M[:, 0, 2, None, None]
    sy = M[:, 1, 0, None, None] * xs + M[:, 1, 1, None, None] * ys \
        + M[:, 1, 2, None, None]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0
    flat = images.astype(jnp.float32).reshape(b, h * w, c)

    def gat(yy, xx):
        valid = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))
        idx = (jnp.clip(yy, 0, h - 1) * w
               + jnp.clip(xx, 0, w - 1)).reshape(b, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(
            b, out_h, out_w, c)
        return vals * valid[..., None]

    out = (gat(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
           + gat(y0, x0 + 1) * (fx * (1 - fy))[..., None]
           + gat(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
           + gat(y0 + 1, x0 + 1) * (fx * fy)[..., None])
    return out[..., 0] if squeeze else out
