"""Visualization + projector smoke tests (headless matplotlib)."""

import matplotlib

matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from esa_pose_estimation_tpu.eval.projector import Projector, register_camera  # noqa: E402
from esa_pose_estimation_tpu.obs import visual  # noqa: E402


class TestProjector:
    def test_project_esa(self):
        proj = Projector()
        pts = np.array([[0.0, 0.0, 0.0]])
        pose = np.hstack([np.eye(3), [[0], [0], [10.0]]])
        uv = proj.project(pts, pose, 'esa')
        np.testing.assert_allclose(uv[0], [960, 600], atol=1e-3)

    def test_register_custom(self):
        register_camera('unit', np.eye(3))
        proj = Projector()
        uv = proj.project(np.array([[1.0, 2.0, 2.0]]),
                          np.hstack([np.eye(3), np.zeros((3, 1))]), 'unit')
        np.testing.assert_allclose(uv[0], [0.5, 1.0], atol=1e-5)


class TestVisual:
    def test_bb8_and_overlay(self, tmp_path):
        img = np.zeros((100, 120), np.float32)
        corners3d = visual.bb8_corners(
            np.random.default_rng(0).normal(size=(30, 3)))
        assert corners3d.shape == (8, 3)
        corners2d = np.random.default_rng(1).uniform(0, 100, (8, 2))
        path = str(tmp_path / 'bb8.png')
        visual.visualize_bounding_box(img, corners2d[None],
                                      corners2d[None] + 3.0,
                                      save=True, save_fn=path)
        import os
        assert os.path.exists(path)

    def test_axes_keypoints_ellipses_mask(self):
        fig, ax = plt.subplots()
        img = np.zeros((64, 64))
        visual.draw_pose_axes(ax, np.array([1.0, 0, 0, 0]),
                              np.array([0.0, 0, 10]))
        visual.draw_keypoints(ax, np.random.uniform(0, 64, (5, 2)),
                              scores=np.linspace(0, 1, 5))
        visual.draw_covariance_ellipses(
            ax, np.random.uniform(0, 64, (3, 2)),
            np.tile(np.eye(2) * 4.0, (3, 1, 1)))
        visual.overlay_mask(ax, img, np.ones((64, 64)))
        plt.close(fig)

    def test_covariance_ellipse_axes(self):
        cov = np.diag([9.0, 1.0])
        _, w, h, angle = visual.covariance_ellipse(np.zeros(2), cov, 1.0)
        assert w == 6.0 and h == 2.0
        assert abs(angle) % 180 < 1e-6


def test_save_eval_panel(tmp_path):
    """One overlay PNG (frame + pred/gt keypoints + box + heatmap
    composite) — the Recorder image-panel equivalent
    (net_utils.py:174-239)."""
    import numpy as np
    from esa_pose_estimation_tpu.obs.visual import save_eval_panel

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    kp = rng.uniform(20, 100, (8, 2))
    hm = rng.uniform(0, 1, (32, 32, 8)).astype(np.float32)
    path = save_eval_panel(str(tmp_path / 'p.png'), frame,
                           kp_pred=kp, kp_gt=kp + 2.0, heatmaps=hm,
                           bbox=np.asarray([20, 20, 100, 100]),
                           title='speed=0.0100')
    assert (tmp_path / 'p.png').exists()
    assert (tmp_path / 'p.png').stat().st_size > 1000
