"""Render tooling + VGG + two-output PVNet model tests."""

import numpy as np

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.utils import render


class TestSampling:
    def test_sphere_points_unit(self):
        pts = render.sample_sphere_points(200)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0,
                                   atol=1e-9)
        # roughly uniform: mean near zero
        assert np.abs(pts.mean(axis=0)).max() < 0.05

    def test_poses_valid_rotations(self):
        Rs, ts = render.sample_poses(32, 0.5, 2.0)
        for R in Rs:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
            assert np.linalg.det(R) > 0.99
        d = np.linalg.norm(ts, axis=-1)
        assert (d >= 0.5).all() and (d <= 2.0).all()

    def test_pose_statistics(self):
        Rs, ts = render.sample_poses(64, 1.0, 3.0)
        stats = render.pose_statistics(Rs, ts)
        assert set(stats) == {'azimuth', 'elevation', 'distance'}
        assert (stats['distance'] >= 1.0).all()


class TestRasterize:
    def test_square_mask(self):
        # a unit quad 1m in front of a simple camera fills the expected box
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        verts = jnp.asarray([[-0.1, -0.1, 0.0], [0.1, -0.1, 0],
                             [0.1, 0.1, 0], [-0.1, 0.1, 0]], jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        mask, depth = render.rasterize(verts, faces, jnp.eye(3),
                                       jnp.asarray([0.0, 0, 1.0]), K, 64, 64)
        mask = np.asarray(mask)
        # projected square spans pixels [22, 42] in both axes
        assert mask[32, 32] and mask[23, 23] and mask[41, 41]
        assert not mask[10, 10] and not mask[50, 50]
        d = np.asarray(depth)
        assert np.isclose(d[32, 32], 1.0, atol=1e-5)
        assert np.isinf(d[0, 0])

    def test_winding_insensitive(self):
        K = jnp.asarray([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
        verts = jnp.asarray([[-0.05, -0.05, 0.0], [0.05, -0.05, 0],
                             [0.0, 0.05, 0]], jnp.float32)
        for faces in ([[0, 1, 2]], [[0, 2, 1]]):
            mask, _ = render.rasterize(verts, jnp.asarray(faces, jnp.int32),
                                       jnp.eye(3), jnp.asarray([0.0, 0, 1.0]),
                                       K, 32, 32)
            assert np.asarray(mask)[16, 16]

    def test_depth_ordering(self):
        # two stacked quads: depth must report the nearer one
        K = jnp.asarray([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
        verts = jnp.asarray(
            [[-0.05, -0.05, 0.0], [0.05, -0.05, 0], [0.0, 0.05, 0],
             [-0.05, -0.05, 0.5], [0.05, -0.05, 0.5], [0.0, 0.05, 0.5]],
            jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        _, depth = render.rasterize(verts, faces, jnp.eye(3),
                                    jnp.asarray([0.0, 0, 1.0]), K, 32, 32)
        assert np.isclose(np.asarray(depth)[16, 16], 1.0, atol=1e-5)


class TestVgg:
    def test_vgg16_convs_scales(self):
        from esa_pose_estimation_tpu.models.vgg import VGG16Convs
        m = VGG16Convs()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        c4, c5 = m.apply(v, jnp.zeros((2, 64, 64, 3)))
        assert c4.shape == (2, 8, 8, 512)
        assert c5.shape == (2, 4, 4, 512)


class TestResNet2o:
    def test_two_heads_and_loss(self):
        from esa_pose_estimation_tpu.models.resnet8s import (
            ResNet8s2o,
            pvnet_loss,
        )
        m = ResNet8s2o(ver_dim=8, seg_dim=2, depth=18, fc_dim=64, s8_dim=32,
                       s4_dim=16, s2_dim=16, raw_dim=16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
        seg, vert = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
        assert seg.shape == (2, 32, 32, 2)
        assert vert.shape == (2, 32, 32, 8)
        mask = jnp.zeros((2, 32, 32)).at[:, 8:24, 8:24].set(1.0)
        target = jnp.zeros((2, 32, 32, 4, 2))
        loss = pvnet_loss(seg, vert, mask, target)
        assert np.isfinite(float(loss))


class TestColorRender:
    """rasterize_color — the OpenGL color-render equivalent
    (opengl_render_backend.py:165-392 role)."""

    def _simple_K(self, size=32):
        return jnp.array([[size, 0., size / 2], [0., size, size / 2],
                          [0., 0., 1.]], jnp.float32)

    def test_barycentric_color_interpolation(self):
        from esa_pose_estimation_tpu.utils.render import rasterize_color
        # one triangle facing the camera, distinct vertex colors
        verts = jnp.array([[-0.4, -0.4, 0.], [0.4, -0.4, 0.],
                           [0., 0.5, 0.]], jnp.float32)
        faces = jnp.array([[0, 1, 2]], jnp.int32)
        colors = jnp.eye(3, dtype=jnp.float32)       # R, G, B corners
        R = jnp.eye(3, dtype=jnp.float32)
        t = jnp.array([0., 0., 1.], jnp.float32)
        rgb, depth, mask = rasterize_color(
            verts, faces, R, t, self._simple_K(), 32, 32, colors,
            ambient=1.0)                              # no shading term
        rgb, mask = np.asarray(rgb), np.asarray(mask)
        assert mask.any() and not mask.all()
        # centroid pixel: barycentric blend ~ (1/3, 1/3, 1/3)
        cy, cx = 15, 16                               # centroid projects near center
        assert mask[cy, cx]
        np.testing.assert_allclose(rgb[cy, cx], rgb[cy, cx].mean(),
                                   atol=0.15)
        # background black, foreground colors sum to ~1 (ambient=1)
        assert rgb[~mask].max() == 0.0
        np.testing.assert_allclose(rgb[mask].sum(-1), 1.0, atol=1e-3)

    def test_zbuffer_front_triangle_wins(self):
        from esa_pose_estimation_tpu.utils.render import rasterize_color
        # two overlapping triangles at different depths
        tri = np.array([[-0.5, -0.5], [0.5, -0.5], [0., 0.6]], np.float32)
        verts = jnp.asarray(np.vstack([
            np.hstack([tri, np.full((3, 1), 0.0)]),     # z=1.0 after t
            np.hstack([tri, np.full((3, 1), -0.3)]),    # z=0.7 (closer)
        ]), jnp.float32)
        faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
        colors = jnp.asarray(np.vstack([np.tile([1., 0., 0.], (3, 1)),
                                        np.tile([0., 1., 0.], (3, 1))]),
                             jnp.float32)
        rgb, depth, mask = rasterize_color(
            verts, faces, jnp.eye(3), jnp.array([0., 0., 1.]),
            self._simple_K(), 32, 32, colors, ambient=1.0)
        rgb, depth, mask = (np.asarray(rgb), np.asarray(depth),
                            np.asarray(mask))
        inner = mask & np.isclose(depth, 0.7, atol=1e-4)
        assert inner.any()
        # everywhere the closer triangle covers, green won
        np.testing.assert_allclose(
            rgb[inner], np.tile([[0., 1., 0.]], (int(inner.sum()), 1)),
            atol=1e-5)

    def test_shading_and_uint8_wrapper(self):
        from esa_pose_estimation_tpu.utils.render import (
            rasterize_color,
            render_color,
        )
        verts = jnp.array([[-0.4, -0.4, 0.], [0.4, -0.4, 0.],
                           [0., 0.5, 0.]], jnp.float32)
        faces = jnp.array([[0, 1, 2]], jnp.int32)
        colors = jnp.full((3, 3), 1.0, jnp.float32)
        R, t = jnp.eye(3), jnp.array([0., 0., 1.])
        _, _, mask = rasterize_color(verts, faces, R, t, self._simple_K(),
                                     32, 32, colors)
        rgb_lo, _, _ = rasterize_color(verts, faces, R, t, self._simple_K(),
                                       32, 32, colors, ambient=0.2)
        rgb_hi, _, _ = rasterize_color(verts, faces, R, t, self._simple_K(),
                                       32, 32, colors, ambient=1.0)
        m = np.asarray(mask)
        # frontal triangle: |n.l| = 1 -> shade = ambient+(1-ambient) = 1
        np.testing.assert_allclose(np.asarray(rgb_lo)[m],
                                   np.asarray(rgb_hi)[m], atol=1e-5)
        pose = np.hstack([np.eye(3), [[0.], [0.], [1.]]])
        img = render_color(verts, faces, pose, self._simple_K(), 32, 32,
                           colors)
        assert img.dtype == np.uint8 and img.shape == (32, 32, 3)
        assert (img[m] > 200).all() and (img[~m] == 0).all()


class TestRasterizeCorrectness:
    """Regressions from review: perspective depth, near-plane clipping,
    one-sided shading, chunk memory bounding."""

    def _K(self, size=32):
        return jnp.array([[size, 0., size / 2], [0., size, size / 2],
                          [0., 0., 1.]], jnp.float32)

    def test_depth_is_perspective_correct(self):
        from esa_pose_estimation_tpu.utils.render import rasterize
        # slanted quad spanning z=1 (left edge, projects to u=0) to z=3
        # (right edge, projects to u=64).  The surface is the plane
        # x = 2.5 z - 3; the ray through pixel u=16 is x = 0, so the true
        # intersection depth is z = 1.2.  AFFINE screen-space z (the old
        # bug) would give 0.75*1 + 0.25*3 = 1.5 there (25% error).
        verts = jnp.array([
            [-0.5, -2.0, 1.0], [-0.5, 2.0, 1.0],     # near edge, z=1
            [4.5, -6.0, 3.0], [4.5, 6.0, 3.0],       # far edge, z=3
        ], jnp.float32)
        faces = jnp.array([[0, 1, 2], [1, 3, 2]], jnp.int32)
        mask, depth = rasterize(verts, faces, jnp.eye(3), jnp.zeros(3),
                                self._K(), 32, 32)
        mask, depth = np.asarray(mask), np.asarray(depth)
        assert mask[16, 16]
        np.testing.assert_allclose(depth[16, 16], 1.2, atol=0.02)

    def test_behind_camera_vertices_are_clipped(self):
        from esa_pose_estimation_tpu.utils.render import rasterize
        # one triangle fully in front, one with a vertex BEHIND the
        # camera (z=-1): the latter must not rasterize phantom coverage
        verts = jnp.array([
            [-0.2, -0.2, 1.0], [0.2, -0.2, 1.0], [0.0, 0.2, 1.0],
            [-0.2, -0.2, 1.0], [0.2, -0.2, 1.0], [0.0, 0.2, -1.0],
        ], jnp.float32)
        faces_front = jnp.array([[0, 1, 2]], jnp.int32)
        faces_bad = jnp.array([[3, 4, 5]], jnp.int32)
        m_front, _ = rasterize(verts, faces_front, jnp.eye(3),
                               jnp.zeros(3), self._K(), 32, 32)
        m_bad, d_bad = rasterize(verts, faces_bad, jnp.eye(3),
                                 jnp.zeros(3), self._K(), 32, 32)
        assert np.asarray(m_front).any()
        assert not np.asarray(m_bad).any()
        assert np.isinf(np.asarray(d_bad)).all()

    def test_backlit_face_gets_ambient_only(self):
        from esa_pose_estimation_tpu.utils.render import rasterize_color
        verts = jnp.array([[-0.4, -0.4, 0.], [0.4, -0.4, 0.],
                           [0., 0.5, 0.]], jnp.float32)
        faces = jnp.array([[0, 1, 2]], jnp.int32)
        colors = jnp.full((3, 3), 1.0, jnp.float32)
        R, t = jnp.eye(3), jnp.array([0., 0., 1.])
        # light travelling TOWARD the camera (-z): the camera-facing
        # triangle is back-lit -> ambient only (abs() used to light it)
        rgb, _, mask = rasterize_color(verts, faces, R, t, self._K(),
                                       32, 32, colors, ambient=0.35,
                                       light_dir=(0., 0., -1.))
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(rgb)[m], 0.35, atol=1e-5)

    def test_chunk_auto_bounds_memory(self):
        from esa_pose_estimation_tpu.utils.render import _bounded_chunk
        assert _bounded_chunk(512, 16, 16) == 512       # tiny: unchanged
        c = _bounded_chunk(512, 1200, 1920)
        assert 1 <= c < 512
        assert c * 1200 * 1920 * 4 <= (64 << 20)
