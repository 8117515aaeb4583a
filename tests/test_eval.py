"""Evaluation layer tests: SPEED score, LINEMOD metrics, submission CSV,
loggers."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

import jax.numpy as jnp

from esa_pose_estimation_tpu.core import camera
from esa_pose_estimation_tpu.eval import (
    AverageMeter,
    SubmissionWriter,
    compute_speed_score,
    speed_score_from_matrices,
)
from esa_pose_estimation_tpu.eval import evaluator
from esa_pose_estimation_tpu.obs import TsvLogger


class TestSpeedScore:
    def test_perfect_pose_scores_zero(self):
        q = jnp.asarray([1.0, 0, 0, 0])
        t = jnp.asarray([0.0, 0, 10])
        s = compute_speed_score(q, t, q, t)
        assert float(s.speed) == pytest.approx(0.0, abs=1e-6)

    def test_reference_formula(self):
        # demo.py:295-310 transcription
        rng = np.random.default_rng(0)
        for _ in range(10):
            q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
            q2 = rng.normal(size=4); q2 /= np.linalg.norm(q2)
            t1 = rng.normal(size=3) + [0, 0, 10]
            t2 = t1 + rng.normal(scale=0.05, size=3)
            score_t = np.linalg.norm(t2 - t1) / np.linalg.norm(t1)
            score_r = 2 * np.real(np.arccos(np.abs(np.dot(q2, q1)) + 0j))
            s = compute_speed_score(jnp.asarray(q2, jnp.float32),
                                    jnp.asarray(t2, jnp.float32),
                                    jnp.asarray(q1, jnp.float32),
                                    jnp.asarray(t1, jnp.float32))
            assert float(s.score_t) == pytest.approx(score_t, rel=1e-4)
            assert float(s.score_r) == pytest.approx(score_r, rel=1e-3, abs=1e-3)

    def test_quaternion_sign_invariance(self):
        q = jnp.asarray([0.5, 0.5, 0.5, 0.5])
        t = jnp.asarray([0.0, 0, 5])
        s = compute_speed_score(-q, t, q, t)
        assert float(s.score_r) == pytest.approx(0.0, abs=1e-3)

    def test_from_matrices(self):
        rng = np.random.default_rng(1)
        R = Rot.random(random_state=rng)
        q = R.as_quat()[[3, 0, 1, 2]]
        t = jnp.asarray([0.1, 0.2, 7.0])
        s = speed_score_from_matrices(
            jnp.asarray(R.as_matrix(), jnp.float32), t,
            jnp.asarray(q, jnp.float32), t)
        assert float(s.speed) < 1e-3


class TestPoseMetrics:
    def setup_method(self):
        rng = np.random.default_rng(2)
        self.pts = jnp.asarray(rng.uniform(-0.05, 0.05, (200, 3)), jnp.float32)
        self.R = jnp.asarray(Rot.random(random_state=rng).as_matrix(),
                             jnp.float32)
        self.t = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
        self.K = jnp.asarray(camera.LINEMOD_K, jnp.float32)

    def test_add_zero_for_identical(self):
        err = evaluator.add_error(self.pts, self.R, self.t, self.R, self.t)
        assert float(err) == pytest.approx(0.0, abs=1e-6)

    def test_add_translation_offset(self):
        t2 = self.t + jnp.asarray([0.01, 0, 0])
        err = evaluator.add_error(self.pts, self.R, t2, self.R, self.t)
        assert float(err) == pytest.approx(0.01, rel=1e-4)

    def test_adds_leq_add(self):
        rng = np.random.default_rng(3)
        R2 = jnp.asarray(Rot.random(random_state=rng).as_matrix(), jnp.float32)
        add = evaluator.add_error(self.pts, R2, self.t, self.R, self.t)
        adds = evaluator.adds_error(self.pts, R2, self.t, self.R, self.t)
        assert float(adds) <= float(add) + 1e-6

    def test_adds_matches_bruteforce(self):
        rng = np.random.default_rng(4)
        R2 = jnp.asarray(Rot.random(random_state=rng).as_matrix(), jnp.float32)
        adds = float(evaluator.adds_error(self.pts, R2, self.t, self.R, self.t))
        a = np.asarray(self.pts) @ np.asarray(R2).T + np.asarray(self.t)
        b = np.asarray(self.pts) @ np.asarray(self.R).T + np.asarray(self.t)
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        expected = d.min(axis=1).mean()
        assert adds == pytest.approx(expected, rel=1e-3)

    def test_pose_accuracy_thresholds(self):
        # tiny perturbation -> all three accuracy bits should be 1
        out = evaluator.pose_accuracy(self.pts, diameter=0.2, K=self.K,
                                      R_pred=self.R, t_pred=self.t + 1e-4,
                                      R_gt=self.R, t_gt=self.t)
        for v in out.values():
            assert float(v) == 1.0
        # gross perturbation -> all zero
        out = evaluator.pose_accuracy(self.pts, diameter=0.2, K=self.K,
                                      R_pred=self.R,
                                      t_pred=self.t + jnp.asarray([0.5, 0, 0]),
                                      R_gt=self.R, t_gt=self.t)
        assert float(out['add']) == 0.0
        assert float(out['cm_degree_5']) == 0.0


class TestSubmission:
    def test_csv_format_and_ordering(self, tmp_path):
        w = SubmissionWriter()
        w.append_real_test('real_b.jpg', [1, 0, 0, 0], [0, 0, 5])
        w.append_test('img_b.jpg', [0.9, 0.1, 0, 0], [1, 2, 3])
        w.append_test('img_a.jpg', [1, 0, 0, 0], [4, 5, 6])
        path = w.export(out_dir=str(tmp_path), suffix='unit')
        rows = [line.split(',') for line in
                open(path).read().strip().split('\n')]
        assert [r[0] for r in rows] == ['img_a.jpg', 'img_b.jpg', 'real_b.jpg']
        assert len(rows[0]) == 8  # filename + 4 quat + 3 trans
        assert float(rows[0][1]) == 1.0

    def test_export_creates_missing_out_dir(self, tmp_path):
        w = SubmissionWriter()
        w.append_test('img.jpg', [1, 0, 0, 0], [0, 0, 5])
        path = w.export(out_dir=str(tmp_path / 'results' / 'run1'),
                        suffix='mkdir')
        assert open(path).read().startswith('img.jpg,')

    def test_append_batch(self, tmp_path):
        w = SubmissionWriter()
        q = np.tile([1.0, 0, 0, 0], (3, 1))
        t = np.tile([0.0, 0, 5], (3, 1))
        w.append_batch(['a.jpg', 'b.jpg', 'c.jpg'], q, t, real=False)
        path = w.export(out_dir=str(tmp_path), suffix='batch')
        assert len(open(path).read().strip().split('\n')) == 3


class TestObs:
    def test_tsv_logger_resume(self, tmp_path):
        p = str(tmp_path / 'log.txt')
        lg = TsvLogger(p)
        lg.set_names(['Epoch', 'LR', 'Train Loss'])
        lg.append([1, 1e-4, 0.5])
        lg.append([2, 1e-4, 0.4])
        lg.close()
        lg2 = TsvLogger(p, resume=True)
        assert lg2.names == ['Epoch', 'LR', 'Train Loss']
        assert lg2.numbers['Train Loss'] == [0.5, 0.4]
        lg2.append([3, 1e-4, 0.3])
        lg2.close()
        assert len(open(p).read().strip().split('\n')) == 4

    def test_tsv_logger_resume_repairs_truncated_tail(self, tmp_path):
        """A run killed mid-write leaves a partial last line with no
        newline; resume must add one so the next append does not merge
        into it (corrupting both rows for every later parse)."""
        p = str(tmp_path / 'log.txt')
        lg = TsvLogger(p)
        lg.set_names(['Epoch', 'LR', 'Train Loss'])
        lg.append([1, 1e-4, 0.5])
        lg.close()
        with open(p, 'a') as f:
            f.write('2\t0.0001\t0.4')        # truncated row, no newline
        lg2 = TsvLogger(p, resume=True)
        lg2.append([3, 1e-4, 0.3])
        lg2.close()
        lines = open(p).read().strip().split('\n')
        assert lines[-1].startswith('3\t'), lines
        lg3 = TsvLogger(p, resume=True)
        assert lg3.numbers['Train Loss'] == [0.5, 0.4, 0.3]
        lg3.close()

    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0 and m.sum == 4.0 and m.count == 2

    def test_tcp_pusher_fail_soft(self):
        from esa_pose_estimation_tpu.obs import TcpPusher
        p = TcpPusher()  # no host configured
        assert p.create_socket() is False
        assert p.send('x') is False
        p2 = TcpPusher(host='127.0.0.1', port=1)  # nothing listening
        assert p2.create_socket() is False


def test_adds_error_chunked_matches_dense():
    # Chunked scan path (n > chunk) must equal the single-block path.
    import jax.numpy as jnp
    from esa_pose_estimation_tpu.eval.evaluator import adds_error
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(37, 3)).astype(np.float32)

    def rot(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    Rp = np.stack([rot(0.1), rot(0.4)])
    Rg = np.stack([rot(0.0), rot(0.5)])
    tp = np.zeros((2, 3), np.float32)
    tg = np.full((2, 3), 0.02, np.float32)
    dense = adds_error(jnp.asarray(pts), Rp, tp, Rg, tg, chunk=64)
    chunked = adds_error(jnp.asarray(pts), Rp, tp, Rg, tg, chunk=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(chunked),
                               rtol=1e-6)
