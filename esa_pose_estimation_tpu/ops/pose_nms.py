"""Parametric pose NMS (pPose-NMS, AlphaPose-style).

TPU-native re-design of the reference's kp6d pose NMS
(reference: kp6d/p_poseNMS.py:17-111 driver, parametric similarity
:239-266, PCK matching :269-280, score-weighted merging ``p_merge_fast``
:198-236, constants :8-14).  The greedy delete-while-loop over a dynamic
candidate list becomes a fixed N-step ``fori_loop`` over alive-masks, so
the whole pass jits with static shapes and vmaps over images.

Reference constants preserved: delta1=1, mu=1.7, delta2=1.3, gamma=22.48,
scoreThreds=0.15, matchThreds=5, alpha=0.1, merge radius min(ref_dist, 15),
PCK radius min(ref_dist, 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DELTA1 = 1.0
MU = 1.7
DELTA2 = 1.3
GAMMA = 22.48
SCORE_THRESH = 0.15
MATCH_THRESH = 5
ALPHA = 0.1


class PoseNmsResult(NamedTuple):
    poses: jnp.ndarray        # (N, K, 2) merged poses (slot-aligned)
    scores: jnp.ndarray       # (N, K) merged per-keypoint scores
    proposal_score: jnp.ndarray  # (N,)
    valid: jnp.ndarray        # (N,) bool


def _pair_dists(poses: jnp.ndarray) -> jnp.ndarray:
    """(N, K, 2) -> (N, N, K) keypoint distances between candidates."""
    return jnp.linalg.norm(poses[:, None] - poses[None, :], axis=-1)


@jax.jit
def pose_nms(poses: jnp.ndarray, scores: jnp.ndarray,
             ref_dists: jnp.ndarray) -> PoseNmsResult:
    """poses: (N, K, 2); scores: (N, K) in [0, 1]; ref_dists: (N,) the
    candidate scale alpha*max(w, h) (p_poseNMS.py:36-39).

    Returns up to N merged poses; ``valid`` marks populated slots.
    """
    n, k, _ = poses.shape
    scores = jnp.clip(jnp.where(scores <= SCORE_THRESH, 1e-5, scores),
                      0.0, 1.0)
    mean_scores = scores.mean(axis=-1)
    dists = _pair_dists(poses)                           # (N, N, K)

    # Parametric similarity of candidate j to pick i (p_poseNMS.py:239-266):
    # sum_k [d<=1] tanh(s_ik) tanh(s_jk) + mu * sum_k exp(-d/delta2)
    tanh_s = jnp.tanh(scores / DELTA1)
    score_term = jnp.einsum('ik,jk,ijk->ij', tanh_s, tanh_s,
                            (dists <= 1.0).astype(scores.dtype))
    point_term = jnp.sum(jnp.exp(-dists / DELTA2), axis=-1)
    simi = score_term + MU * point_term                  # (N, N)

    # PCK matches of candidate j to pick i (p_poseNMS.py:269-280)
    pck_r = jnp.minimum(ref_dists, 7.0)
    matches = jnp.sum(dists / pck_r[:, None, None] <= 1.0, axis=-1)

    def body(step, carry):
        alive, picks, clusters, valids = carry
        any_alive = alive.any()
        masked = jnp.where(alive, mean_scores, -jnp.inf)
        pick = jnp.argmax(masked)
        del_mask = alive & ((simi[pick] > GAMMA)
                            | (matches[pick] >= MATCH_THRESH))
        del_mask = del_mask.at[pick].set(True)           # always remove pick
        picks = picks.at[step].set(pick)
        clusters = clusters.at[step].set(del_mask & alive)
        valids = valids.at[step].set(any_alive)
        alive = alive & ~del_mask
        return alive, picks, clusters, valids

    alive0 = jnp.ones((n,), bool)
    picks0 = jnp.zeros((n,), jnp.int32)
    clusters0 = jnp.zeros((n, n), bool)
    valids0 = jnp.zeros((n,), bool)
    _, picks, clusters, valids = jax.lax.fori_loop(
        0, n, body, (alive0, picks0, clusters0, valids0))

    # Score-weighted merge per pick (p_merge_fast, :198-236)
    ref_pose = poses[picks]                              # (N, K, 2)
    merge_r = jnp.minimum(ref_dists[picks], 15.0)        # (N,)
    d_ref = jnp.linalg.norm(ref_pose[:, None] - poses[None, :], axis=-1)
    # (slot, candidate, keypoint) membership
    member = ((d_ref <= merge_r[:, None, None])
              & clusters[:, :, None]).astype(scores.dtype)
    w = member * scores[None, :, :]                      # (N, Ncand, K)
    wsum = jnp.maximum(w.sum(axis=1), 1e-9)
    wn = w / wsum[:, None, :]
    merged_pose = jnp.einsum('snk,nkc->skc', wn, poses)
    merged_score = jnp.sum(w * wn, axis=1)               # (N, K)

    max_score = merged_score.max(axis=-1)
    valid = valids & (max_score >= SCORE_THRESH)
    proposal = merged_score.mean(axis=-1) + 1.25 * max_score
    return PoseNmsResult(poses=merged_pose, scores=merged_score,
                         proposal_score=jnp.where(valid, proposal, 0.0),
                         valid=valid)


def ref_dists_from_bboxes(bboxes: jnp.ndarray) -> jnp.ndarray:
    """alpha * max(width, height) per candidate box (p_poseNMS.py:32-39)."""
    w = bboxes[..., 2] - bboxes[..., 0]
    h = bboxes[..., 3] - bboxes[..., 1]
    return ALPHA * jnp.maximum(w, h)


def write_json(all_results, output_path: str, for_eval: bool = False
               ) -> str:
    """COCO/AlphaPose-style result export (p_poseNMS.py:283-314 parity).

    all_results: iterable of {'imgname': str, 'result': [{'keypoints'
    (K, 2), 'kp_score' (K,), 'proposal_score' float}, ...]} — e.g. built
    from :func:`pose_nms` outputs filtered by ``valid``.  Writes
    ``alphapose-results.json`` under ``output_path`` and returns the file
    path.  ``for_eval`` emits integer image ids (the reference's
    trailing-number rule) instead of file names.
    """
    import json
    import os

    json_results = []
    for im_res in all_results:
        im_name = str(im_res['imgname'])
        base = im_name.split('/')[-1]
        for human in im_res['result']:
            kp = jnp.asarray(human['keypoints']).reshape(-1, 2)
            ks = jnp.asarray(human['kp_score']).reshape(-1)
            flat = []
            for n in range(ks.shape[0]):
                flat += [float(kp[n, 0]), float(kp[n, 1]), float(ks[n])]
            json_results.append({
                'image_id': (int(base.split('.')[0].split('_')[-1])
                             if for_eval else base),
                'category_id': 1,
                'keypoints': flat,
                'score': float(human['proposal_score']),
            })
    os.makedirs(output_path, exist_ok=True)
    path = os.path.join(output_path, 'alphapose-results.json')
    with open(path, 'w') as f:
        f.write(json.dumps(json_results))
    return path
