"""Training stack tests: losses vs torch transcription, sharded train step
convergence on synthetic data, LR schedule, checkpointing round trip."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.data import synthetic
from esa_pose_estimation_tpu.models import HRNet
from esa_pose_estimation_tpu.parallel import make_mesh, shard_batch, replicate
from esa_pose_estimation_tpu.train import loss as loss_mod
from esa_pose_estimation_tpu.train import state as state_mod
from esa_pose_estimation_tpu.train.checkpoint import CheckpointManager
from esa_pose_estimation_tpu.utils import config as cfg_mod


def torch_heatmap_wing(y_pred, y, alpha=2.1, omega=14.0, eps=2.0, theta=0.5):
    # numpy transcription of reference loss.py:61-80
    lossMat = np.zeros_like(y_pred)
    C = theta - omega * np.log(1 + (theta / (eps - y)) ** (alpha - y))
    d = np.abs(y - y_pred)
    case1 = d < theta
    case2 = ~case1
    lossMat[case1] = omega * np.log(
        1 + np.abs((y[case1] - y_pred[case1]) / (eps - y[case1])) ** (alpha - y[case1]))
    lossMat[case2] = d[case2] - C[case2]
    return lossMat


class TestLosses:
    def test_heatmap_wing_matches_reference(self):
        rng = np.random.default_rng(0)
        y = rng.uniform(0, 1, size=(4, 16, 16)).astype(np.float64)
        y_pred = np.clip(y + rng.normal(scale=0.3, size=y.shape), -0.5, 1.5)
        ref = torch_heatmap_wing(y_pred, y)
        ours = np.asarray(loss_mod.heatmap_wing(jnp.asarray(y_pred),
                                                jnp.asarray(y)))
        # ours computes in f32 (JAX default); reference transcription in f64
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-6)

    def test_weighted_loss_scalar(self):
        y = jnp.zeros((2, 8, 8, 3))
        pred = jnp.zeros((2, 8, 8, 3))
        w = jnp.zeros((2, 8, 8, 3))
        out = loss_mod.weighted_heatmap_loss(pred, y, w)
        assert out.shape == ()
        assert float(out) == pytest.approx(0.0, abs=1e-7)

    def test_gradients_finite(self):
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
        w = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)

        def f(pred):
            return loss_mod.weighted_heatmap_loss(pred, y, w)

        g = jax.grad(f)(y * 0.5)
        assert np.isfinite(np.asarray(g)).all()

    def test_other_losses_shapes(self):
        x = jnp.linspace(-2, 2, 50)
        y = jnp.zeros(50)
        for fn in (loss_mod.adaptive_wing, loss_mod.wing, loss_mod.smooth_l1):
            out = fn(x, y)
            assert out.shape == (50,)
            assert np.isfinite(np.asarray(out)).all()


class TestLrSchedule:
    def test_boundaries(self):
        cfg = cfg_mod.TrainConfig()
        sched = state_mod.lr_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(79 * 10)) == pytest.approx(1e-4)
        assert float(sched(80 * 10)) == pytest.approx(1e-5)
        assert float(sched(100 * 10)) == pytest.approx(1e-6)
        assert float(sched(170 * 10)) == pytest.approx(1e-7, rel=1e-5)


class TestTrainStep:
    @pytest.fixture(scope='class')
    def setup(self):
        cfg = cfg_mod.TrainConfig(batch_size=8, crop_size=32, lr=1e-3,
                                  lr_values=(1e-3, 1e-4, 1e-5, 1e-6))
        model = HRNet(cfg_mod.hrnet_tiny())
        pts = synthetic.spacecraft_points(6)
        batch = synthetic.make_batch(jax.random.PRNGKey(0), 8, pts,
                                     crop_size=32)
        batch = {k: batch[k] for k in ('image', 'heatmaps', 'weights')}
        st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(1),
                                          (1, 32, 32, 1))
        return st, batch

    def test_loss_decreases(self, setup):
        st, batch = setup
        mesh = make_mesh(8)
        step = state_mod.make_sharded_train_step(mesh)
        st = replicate(st, mesh)
        sbatch = shard_batch(batch, mesh)
        losses = []
        for _ in range(12):
            st, metrics = step(st, sbatch)
            losses.append(float(metrics['loss']))
        assert losses[-1] < losses[0] * 0.7, losses
        assert np.isfinite(losses).all()

    def test_batch_sharded_over_mesh(self, setup):
        st, batch = setup
        mesh = make_mesh(8)
        sbatch = shard_batch(batch, mesh)
        sharding = sbatch['image'].sharding
        assert sharding.spec == jax.sharding.PartitionSpec('data')
        assert len(sharding.mesh.devices.flatten()) == 8

    def test_scan_step_matches_per_step_loop(self):
        """The fused lax.scan segment (one dispatch per log interval,
        cli/train.py synthetic path) must produce the SAME weights and
        per-step losses as the per-step loop it replaces — the key stream
        fold_in(ekey, base + j) is identical by construction.

        Builds its own state: the class fixture's state is donated by the
        sharded step in earlier tests (donate_argnums), so its buffers
        may already be deleted here."""
        cfg = cfg_mod.TrainConfig(batch_size=8, crop_size=32, lr=1e-3,
                                  lr_values=(1e-3, 1e-4, 1e-5, 1e-6))
        model = HRNet(cfg_mod.hrnet_tiny())
        st0 = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(7),
                                           (1, 32, 32, 1))
        mesh = make_mesh(8)
        pts = synthetic.spacecraft_points(6)
        ekey = jax.random.PRNGKey(42)
        n = 3

        def batch_fn(k):
            return synthetic.make_batch(k, 8, pts, crop_size=32)

        # reference: per-step loop, shared train_step
        step = state_mod.make_sharded_train_step(mesh)
        st_a = replicate(jax.tree.map(jnp.copy, st0), mesh)
        losses_a = []
        for i in range(n):
            b = batch_fn(jax.random.fold_in(ekey, i))
            b = {k: b[k] for k in ('image', 'heatmaps', 'weights')}
            st_a, m = step(st_a, shard_batch(b, mesh))
            losses_a.append(float(m['loss']))

        # fused: one scan dispatch
        scan = state_mod.make_sharded_scan_step(mesh, batch_fn, n)
        st_b = replicate(jax.tree.map(jnp.copy, st0), mesh)
        st_b, losses_b = scan(st_b, ekey, jnp.int32(0))

        np.testing.assert_allclose(np.asarray(losses_b), losses_a,
                                   rtol=1e-5, atol=1e-7)
        # The sharp identity check is the loss comparison above: losses at
        # steps 2-3 depend on every prior update, so a wrong key stream,
        # batch order, or state threading diverges them at O(1).  Params
        # themselves CANNOT be compared tightly under Adam: the scan
        # program fuses/reassociates float32 math across steps, and for
        # near-zero gradient elements Adam's m/sqrt(v) saturates at +-1,
        # so a reassociation-induced sign flip moves that element by up to
        # lr per step (measured: 3/129600 elements at 4e-4 after 3 steps
        # of lr=1e-3).  Bound by the Adam per-element update bound.
        adam_bound = n * 1e-3        # steps x lr
        pa = jax.tree.leaves(st_a.params)
        pb = jax.tree.leaves(st_b.params)
        for xa, xb in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       atol=adam_bound)


class TestCheckpoint:
    def test_roundtrip_and_best_aliases(self, tmp_path):
        cfg = cfg_mod.TrainConfig(batch_size=4, crop_size=32)
        model = HRNet(cfg_mod.hrnet_tiny())
        st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(2),
                                          (1, 32, 32, 1))
        mgr = CheckpointManager(str(tmp_path / 'ckpt'))
        best = mgr.save_rolling(st, epoch=3, score_tran=0.5, score_rotate=0.9,
                                best={})
        assert best == {'best_tran': 0.5, 'best_rotate': 0.9}
        # worse scores must not overwrite the best aliases
        best = mgr.save_rolling(st, epoch=4, score_tran=0.7, score_rotate=1.2,
                                best=best)
        assert best == {'best_tran': 0.5, 'best_rotate': 0.9}

        st2 = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(3),
                                           (1, 32, 32, 1))
        st2, next_epoch = mgr.restore('last', st2)
        assert next_epoch == 5
        for a, b in zip(jax.tree.leaves(st.params),
                        jax.tree.leaves(st2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_best_scores_survive_resume(self, tmp_path):
        """Regression: a crash resume restarted the best gates at inf, so
        the first eval after restart clobbered best_tran/best_rotate with
        worse weights.  The running minima are persisted in a sidecar."""
        cfg = cfg_mod.TrainConfig(batch_size=4, crop_size=32)
        model = HRNet(cfg_mod.hrnet_tiny())
        st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(5),
                                          (1, 32, 32, 1))
        mgr = CheckpointManager(str(tmp_path / 'ckpt'))
        mgr.save_rolling(st, epoch=3, score_tran=0.02, score_rotate=0.05,
                         best={})
        # fresh manager = restarted process
        mgr2 = CheckpointManager(str(tmp_path / 'ckpt'))
        best = mgr2.load_best()
        assert best == {'best_tran': 0.02, 'best_rotate': 0.05}
        st_worse = state_mod.create_train_state(
            model, cfg, jax.random.PRNGKey(6), (1, 32, 32, 1))
        best = mgr2.save_rolling(st_worse, epoch=4, score_tran=0.5,
                                 score_rotate=0.6, best=best)
        assert best == {'best_tran': 0.02, 'best_rotate': 0.05}
        # best_tran checkpoint still holds the epoch-3 weights
        st_r, ep = mgr2.restore('best_tran', st_worse)
        assert ep == 4  # saved at epoch 3 -> next epoch 4
        for a, b in zip(jax.tree.leaves(st.params),
                        jax.tree.leaves(st_r.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert mgr2.load_best() == {'best_tran': 0.02, 'best_rotate': 0.05}

    def test_restore_missing_returns_epoch_zero(self, tmp_path):
        cfg = cfg_mod.TrainConfig(batch_size=4, crop_size=32)
        model = HRNet(cfg_mod.hrnet_tiny())
        st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(4),
                                          (1, 32, 32, 1))
        mgr = CheckpointManager(str(tmp_path / 'empty'))
        _, epoch = mgr.restore('last', st)
        assert epoch == 0


class TestSyntheticData:
    def test_batch_contents(self):
        pts = synthetic.spacecraft_points()
        batch = synthetic.make_batch(jax.random.PRNGKey(5), 4, pts,
                                     crop_size=64)
        assert batch['image'].shape == (4, 64, 64, 1)
        assert batch['heatmaps'].shape == (4, 64, 64, 30)
        assert batch['weights'].shape == (4, 64, 64, 30)
        # heatmap peaks must sit at the crop-space keypoints
        hm = np.asarray(batch['heatmaps'])
        kp = np.asarray(batch['keypoints_crop'])
        for b in range(4):
            for k in range(0, 30, 7):
                if (kp[b, k] < 2).any() or (kp[b, k] > 62).any():
                    continue
                idx = hm[b, :, :, k].argmax()
                py, px = divmod(idx, 64)
                assert abs(px - kp[b, k, 0]) <= 1.0
                assert abs(py - kp[b, k, 1]) <= 1.0

    def test_pose_depth_range(self):
        pts = synthetic.spacecraft_points()
        batch = synthetic.make_batch(jax.random.PRNGKey(6), 16, pts,
                                     crop_size=32, render=False)
        z = np.asarray(batch['trans'][:, 2])
        assert (z > 4.9).all() and (z < 30.1).all()


class TestEvalPanels:
    def test_evaluate_writes_panels_and_reports_dir(self, tmp_path):
        """cli.train.evaluate(panel_dir=...) emits one PNG per frame (up
        to n_panels) from the first batch and returns the directory so
        the JSONL eval event references it (VERDICT r2 item 9)."""
        import jax
        import numpy as np

        from esa_pose_estimation_tpu.cli.train import evaluate
        from esa_pose_estimation_tpu.data import synthetic
        from esa_pose_estimation_tpu.models import HRNet
        from esa_pose_estimation_tpu.utils import config as cfg_mod

        model = HRNet(cfg_mod.hrnet_tiny())
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1)), train=False)
        pts = synthetic.spacecraft_points(6)
        batch = synthetic.make_batch(jax.random.PRNGKey(1), 3, pts,
                                     crop_size=32, with_frames=True)
        pdir = str(tmp_path / 'panels' / 'epoch001')
        result = evaluate(model, variables, [batch], pts,
                          jax.random.PRNGKey(2), crop_size=32,
                          panel_dir=pdir, n_panels=2)
        assert result['panel_dir'] == pdir
        pngs = sorted(os.listdir(pdir))
        assert pngs == ['frame00.png', 'frame01.png']
        assert all(os.path.getsize(os.path.join(pdir, p)) > 1000
                   for p in pngs)


class TestEvalNonfiniteGuard:
    """cli/train.evaluate: a frame whose pose solve goes non-finite must
    be counted, excluded from the epoch mean, and a fully degenerate
    eval must report inf (never the meter's 0.0 initial value) so the
    best gates cannot fire on it."""

    @staticmethod
    def _run_eval(monkeypatch, bad_frames):
        import jax.numpy as jnp
        import numpy as np

        from esa_pose_estimation_tpu.cli import train as train_cli
        from esa_pose_estimation_tpu.pipeline import PoseOutput

        b, k = 4, 6

        def fake_infer(model, variables, frames, bboxes, points_3d, key,
                       **kw):
            R = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
            t = jnp.tile(jnp.asarray([0.0, 0.0, 10.0])[None], (b, 1))
            bad = jnp.asarray(bad_frames)[:, None]
            t = jnp.where(bad, jnp.nan, t)
            return PoseOutput(
                quat=jnp.zeros((b, 4)), trans=t, R=R,
                keypoints_2d=jnp.zeros((b, k, 2)),
                confidences=jnp.zeros((b, k)),
                selected=jnp.zeros((b, k), bool),
                heatmaps=jnp.zeros((b, 8, 8, k)),
                rates=jnp.ones((b,)), origins=jnp.zeros((b, 2)))

        monkeypatch.setattr(train_cli, 'infer_poses', fake_infer)
        batch = {
            'frame': np.zeros((b, 16, 16), np.float32),
            'bbox': np.tile(np.asarray([0, 0, 15, 15], np.float32),
                            (b, 1)),
            'quat': np.tile(np.asarray([1, 0, 0, 0], np.float32), (b, 1)),
            'trans': np.tile(np.asarray([0, 0, 10.0], np.float32),
                             (b, 1)),
        }
        import jax
        return train_cli.evaluate(None, None, [batch],
                                  jnp.zeros((k, 3)),
                                  jax.random.PRNGKey(0))

    def test_partial_nonfinite_excluded(self, monkeypatch):
        import numpy as np
        result = self._run_eval(monkeypatch, [False, True, False, False])
        assert result['nonfinite'] == 1
        assert np.isfinite(result['speed'])
        # identity pose vs identity ground truth: finite frames score ~0
        assert result['speed'] < 1e-5

    def test_all_nonfinite_reports_inf(self, monkeypatch):
        result = self._run_eval(monkeypatch, [True, True, True, True])
        assert result['nonfinite'] == 4
        assert result['score_t'] == float('inf')
        assert result['score_r'] == float('inf')
