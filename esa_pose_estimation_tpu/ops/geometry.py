"""Point-cloud geometry utilities: farthest point sampling, nearest
neighbors.

TPU-native replacements for the reference's native kernels in
``lib/utils/extend_utils``:

* :func:`farthest_point_sampling` — the C++ FPS
  (src/farthest_point_sampling.cpp:40-207, wrapper extend_utils.py:23-38)
  that selects the canonical K keypoints from model meshes.  Fixed-K
  ``lax.scan`` over argmax steps: distance updates are fully vectorized,
  only the K selection steps are sequential (inherent to FPS).
* :func:`nearest_neighbor_index` / :func:`nearest_neighbor_distance` —
  the CUDA NN search (src/nearest_neighborhood.cu:48-167, wrapper
  extend_utils.py:40-61) used by the symmetric ADD metric
  (evaluation.py:162-170).  Tiled pairwise-distance contraction on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import linalg


@partial(jax.jit, static_argnames=('k',))
def farthest_point_sampling(points: jnp.ndarray, k: int,
                            init_center: bool = True) -> jnp.ndarray:
    """Select k points maximizing mutual distance.  points: (N, 3) ->
    indices (k,) int32.

    ``init_center=True`` starts from the point closest to the centroid
    (deterministic, matching the reference's behavior of seeding FPS
    from the object center).
    """
    n = points.shape[0]
    if init_center:
        centroid = jnp.mean(points, axis=0)
        first = jnp.argmin(jnp.linalg.norm(points - centroid, axis=-1))
    else:
        first = jnp.asarray(0, jnp.int32)

    d0 = jnp.linalg.norm(points - points[first], axis=-1)

    def body(carry, _):
        dist = carry
        nxt = jnp.argmax(dist)
        d_new = jnp.linalg.norm(points - points[nxt], axis=-1)
        return jnp.minimum(dist, d_new), nxt

    _, rest = jax.lax.scan(body, d0, None, length=k - 1)
    return jnp.concatenate([first[None].astype(jnp.int32),
                            rest.astype(jnp.int32)])


def _pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances (one MXU
    contraction plus rank-1 terms)."""
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = linalg.einsum('...ni,...mi->...nm', a, b)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def nearest_neighbor_index(query: jnp.ndarray,
                           reference: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest reference point per query. -> (..., N) int32."""
    return jnp.argmin(_pairwise_sq_dist(query, reference), axis=-1)


def nearest_neighbor_distance(query: jnp.ndarray,
                              reference: jnp.ndarray) -> jnp.ndarray:
    """Distance to the nearest reference point per query. -> (..., N)."""
    return jnp.sqrt(jnp.min(_pairwise_sq_dist(query, reference), axis=-1))
