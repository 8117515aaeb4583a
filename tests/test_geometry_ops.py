"""FPS / NN / pose-NMS op tests."""

import numpy as np

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.ops import geometry, pose_nms


class TestFps:
    def test_selects_spread_points(self):
        # cube corners + center cluster: FPS(k=8) must pick the corners
        corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                            for z in (0, 1)], np.float32)
        cluster = np.full((50, 3), 0.5, np.float32) + \
            np.random.default_rng(0).normal(scale=0.01, size=(50, 3)).astype(np.float32)
        pts = np.concatenate([cluster, corners])
        idx = np.asarray(geometry.farthest_point_sampling(jnp.asarray(pts), 9))
        # first point is near the centroid; the rest are the 8 corners
        assert set(idx[1:].tolist()) == set(range(50, 58))

    def test_no_duplicates(self):
        pts = np.random.default_rng(1).normal(size=(100, 3)).astype(np.float32)
        idx = np.asarray(geometry.farthest_point_sampling(jnp.asarray(pts), 30))
        assert len(set(idx.tolist())) == 30


class TestNearestNeighbor:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(64, 3)).astype(np.float32)
        r = rng.normal(size=(128, 3)).astype(np.float32)
        idx = np.asarray(geometry.nearest_neighbor_index(
            jnp.asarray(q), jnp.asarray(r)))
        d = np.linalg.norm(q[:, None] - r[None], axis=-1)
        np.testing.assert_array_equal(idx, d.argmin(axis=1))
        dist = np.asarray(geometry.nearest_neighbor_distance(
            jnp.asarray(q), jnp.asarray(r)))
        np.testing.assert_allclose(dist, d.min(axis=1), rtol=1e-4, atol=1e-5)


class TestPoseNms:
    def _candidates(self):
        # two clusters of 3 near-identical poses + one distinct pose
        rng = np.random.default_rng(3)
        base1 = rng.uniform(100, 200, size=(32, 2)).astype(np.float32)
        base2 = base1 + 300.0
        poses = np.stack([base1 + rng.normal(scale=0.5, size=(32, 2))
                          for _ in range(3)] +
                         [base2 + rng.normal(scale=0.5, size=(32, 2))
                          for _ in range(3)] +
                         [base1 + 150.0]).astype(np.float32)
        scores = np.full((7, 32), 0.8, np.float32)
        scores[6] = 0.5
        boxes = np.tile(np.asarray([0, 0, 400, 400], np.float32), (7, 1))
        return poses, scores, boxes

    def test_clusters_collapse(self):
        poses, scores, boxes = self._candidates()
        res = pose_nms.pose_nms(
            jnp.asarray(poses), jnp.asarray(scores),
            pose_nms.ref_dists_from_bboxes(jnp.asarray(boxes)))
        valid = np.asarray(res.valid)
        assert valid.sum() == 3  # two clusters + the lone pose
        # merged cluster pose ~ cluster mean
        merged = np.asarray(res.poses)[valid]
        base1_mean = poses[:3].mean(axis=0)
        errs = [np.abs(m - base1_mean).max() for m in merged]
        assert min(errs) < 1.0

    def test_low_scores_filtered(self):
        poses, scores, boxes = self._candidates()
        scores[:] = 0.01  # below SCORE_THRESH
        res = pose_nms.pose_nms(
            jnp.asarray(poses), jnp.asarray(scores),
            pose_nms.ref_dists_from_bboxes(jnp.asarray(boxes)))
        assert not np.asarray(res.valid).any()

    def test_proposal_score_formula(self):
        poses, scores, boxes = self._candidates()
        res = pose_nms.pose_nms(
            jnp.asarray(poses), jnp.asarray(scores),
            pose_nms.ref_dists_from_bboxes(jnp.asarray(boxes)))
        v = np.asarray(res.valid)
        ms = np.asarray(res.scores)[v]
        expected = ms.mean(axis=-1) + 1.25 * ms.max(axis=-1)
        np.testing.assert_allclose(np.asarray(res.proposal_score)[v],
                                   expected, rtol=1e-5)
