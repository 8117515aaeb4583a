"""LINEMOD family tests: PLY parsing, model DB, vertex fields, augmentation."""

import numpy as np

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.data import augment
from esa_pose_estimation_tpu.data.linemod import (
    LineModModelDB,
    load_ply_vertices,
    model_diameter,
)
from esa_pose_estimation_tpu.ops import vertex, voting


def write_ply_ascii(path, verts):
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n')
        f.write(f'element vertex {len(verts)}\n')
        f.write('property float x\nproperty float y\nproperty float z\n')
        f.write('end_header\n')
        for v in verts:
            f.write(f'{v[0]} {v[1]} {v[2]}\n')


def write_ply_binary(path, verts):
    import struct
    with open(path, 'wb') as f:
        f.write(b'ply\nformat binary_little_endian 1.0\n')
        f.write(f'element vertex {len(verts)}\n'.encode())
        f.write(b'property float x\nproperty float y\nproperty float z\n')
        f.write(b'end_header\n')
        for v in verts:
            f.write(struct.pack('<fff', *v))


class TestPly:
    def test_ascii_binary_agree(self, tmp_path):
        rng = np.random.default_rng(0)
        verts = rng.normal(size=(50, 3)).astype(np.float32)
        pa = tmp_path / 'a.ply'
        pb = tmp_path / 'b.ply'
        write_ply_ascii(pa, verts)
        write_ply_binary(pb, verts)
        va = load_ply_vertices(str(pa))
        vb = load_ply_vertices(str(pb))
        np.testing.assert_allclose(va, verts, atol=1e-5)
        np.testing.assert_allclose(vb, verts, atol=1e-6)

    def test_diameter(self):
        verts = np.array([[0, 0, 0], [3, 4, 0], [1, 1, 1]], float)
        assert model_diameter(verts) == 5.0


class TestModelDB:
    def test_register_and_query(self, tmp_path):
        rng = np.random.default_rng(1)
        verts = rng.uniform(-0.05, 0.05, (500, 3))
        db = LineModModelDB()
        db.register('cat', vertices=verts)
        assert db.get_diameter('cat') > 0.1
        assert db.get_corners_3d('cat').shape == (8, 3)
        fps = db.get_farthest_3d('cat', 8)
        assert fps.shape == (8, 3)
        # keypoints must be distinct, well-spread
        d = np.linalg.norm(fps[:, None] - fps[None], axis=-1)
        assert d[np.triu_indices(8, 1)].min() > 0.02
        assert db.is_symmetric('eggbox') and not db.is_symmetric('cat')


class TestVertexField:
    def test_field_roundtrip_through_voting(self):
        # vertex_field -> ransac_voting must recover the keypoints
        mask = np.zeros((1, 64, 64), np.float32)
        mask[0, 8:56, 8:56] = 1.0
        kps = jnp.asarray([[[20.0, 30.0], [44.5, 12.25]]], jnp.float32)
        field = vertex.vertex_field(jnp.asarray(mask), kps)
        assert field.shape == (1, 64, 64, 2, 2)
        res = voting.ransac_voting(jnp.asarray(mask), field,
                                   jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(res.keypoints[0]),
                                   np.asarray(kps[0]), atol=0.15)

    def test_masked_out_zero(self):
        mask = jnp.zeros((1, 16, 16))
        field = vertex.vertex_field(mask, jnp.asarray([[[5.0, 5.0]]]))
        assert float(jnp.abs(field).max()) == 0.0

    def test_vertex_loss_zero_for_exact(self):
        mask = jnp.ones((1, 16, 16))
        kps = jnp.asarray([[[5.0, 5.0]]])
        field = vertex.vertex_field(mask, kps)
        assert float(vertex.vertex_loss(field, field, mask)) == 0.0


class TestAugmentation:
    def _scene(self, b=3):
        rng = np.random.default_rng(2)
        imgs = rng.uniform(0, 255, (b, 64, 64)).astype(np.float32)
        masks = np.zeros((b, 64, 64), np.float32)
        masks[:, 16:48, 16:48] = 1.0
        kps = rng.uniform(20, 44, (b, 4, 2)).astype(np.float32)
        return jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(kps)

    def test_rotate_preserves_mask_area(self):
        imgs, masks, kps = self._scene()
        img2, mask2, kp2 = augment.random_rotate(jax.random.PRNGKey(0),
                                                 imgs, masks, kps, 25.0)
        a1 = np.asarray(masks).sum(axis=(1, 2))
        a2 = np.asarray(mask2).sum(axis=(1, 2))
        np.testing.assert_allclose(a2, a1, rtol=0.08)
        # keypoint stays inside rotated mask region
        assert np.isfinite(np.asarray(kp2)).all()

    def test_rotate_zero_angle_identity(self):
        imgs, masks, kps = self._scene()
        img2, mask2, kp2 = augment.random_rotate(jax.random.PRNGKey(0),
                                                 imgs, masks, kps, 0.0)
        np.testing.assert_allclose(np.asarray(img2), np.asarray(imgs),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(kp2), np.asarray(kps),
                                   atol=1e-4)

    def test_flip_consistency(self):
        imgs, masks, kps = self._scene(8)
        img2, mask2, kp2 = augment.random_flip(jax.random.PRNGKey(1),
                                               imgs, masks, kps)
        flipped = ~np.isclose(np.asarray(img2), np.asarray(imgs)).all(
            axis=(1, 2))
        for b in np.where(flipped)[0]:
            np.testing.assert_allclose(np.asarray(kp2[b, :, 0]),
                                       63 - np.asarray(kps[b, :, 0]))

    def test_occlusion_reduces_mask(self):
        _, masks, _ = self._scene()
        m2 = augment.random_occlusion(jax.random.PRNGKey(2), masks)
        assert float(jnp.sum(m2)) <= float(jnp.sum(masks))

    def test_blur_smooths(self):
        imgs, _, _ = self._scene()
        b2 = augment.random_blur(jax.random.PRNGKey(3), imgs, prob=1.0)
        tv = lambda x: np.abs(np.diff(np.asarray(x), axis=-1)).mean()  # noqa: E731
        assert tv(b2) < tv(imgs)
