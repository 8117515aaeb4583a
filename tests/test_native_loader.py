"""Native shard loader tests: build the C++ library, write synthetic
shards (raw + PNG), read them back, verify contents/shuffling/epochs."""

import os

import numpy as np
import pytest

from esa_pose_estimation_tpu.data import shards
from esa_pose_estimation_tpu.data.native_loader import (
    NativeBatchLoader,
    build_library,
)


@pytest.fixture(scope='module')
def lib():
    return build_library()


def write_shard(path, n=10, h=48, w=64, n_kp=5, compressed=False, seed=0):
    rng = np.random.default_rng(seed)
    frames, metas = [], []
    with shards.ShardWriter(str(path), h, w, n_kp,
                            compressed=compressed) as sw:
        for i in range(n):
            frame = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
            bbox = rng.uniform(0, 40, 4).astype(np.float32)
            kp = rng.uniform(0, 64, (n_kp, 2)).astype(np.float32)
            quat = rng.normal(size=4).astype(np.float32)
            trans = rng.normal(size=3).astype(np.float32)
            sw.add(f'img{i:03d}.jpg', frame, bbox, kp, quat, trans)
            frames.append(frame)
            metas.append((bbox, kp, quat, trans))
    return frames, metas


class TestNativeLoader:
    def test_library_builds(self, lib):
        import os
        assert os.path.exists(lib)

    @pytest.mark.parametrize('compressed', [False, True])
    def test_roundtrip(self, tmp_path, lib, compressed):
        path = tmp_path / f'shard_{compressed}.spd'
        frames, metas = write_shard(path, n=10, compressed=compressed)
        loader = NativeBatchLoader(str(path), batch_size=4, shuffle=False,
                                   drop_last=False, n_threads=2)
        assert loader.meta.n_records == 10
        seen = []
        for batch in loader:
            for j, name in enumerate(batch['name']):
                idx = int(name[3:6])
                seen.append(idx)
                np.testing.assert_array_equal(
                    batch['frame'][j].astype(np.uint8), frames[idx])
                np.testing.assert_allclose(batch['bbox'][j], metas[idx][0])
                np.testing.assert_allclose(batch['keypoints_2d'][j],
                                           metas[idx][1])
                np.testing.assert_allclose(batch['quat'][j], metas[idx][2])
                np.testing.assert_allclose(batch['trans'][j], metas[idx][3])
        assert seen == list(range(10))
        loader.close()

    def test_shuffle_and_epochs(self, tmp_path, lib):
        path = tmp_path / 'shard_s.spd'
        write_shard(path, n=16)
        loader = NativeBatchLoader(str(path), batch_size=4, shuffle=True,
                                   seed=1, n_threads=2)
        def epoch_order():
            return [n for b in loader for n in b['name']]
        e1 = epoch_order()
        e2 = epoch_order()
        assert sorted(e1) == sorted(e2)
        assert e1 != e2  # different epoch seeds -> different order
        assert len(e1) == 16
        loader.close()

    def test_drop_last(self, tmp_path, lib):
        path = tmp_path / 'shard_d.spd'
        write_shard(path, n=10)
        loader = NativeBatchLoader(str(path), batch_size=4, shuffle=False,
                                   drop_last=True, n_threads=1)
        counts = [len(b['name']) for b in loader]
        assert counts == [4, 4]
        loader.close()

    def test_small_frame_padding(self, tmp_path, lib):
        # frames smaller than the shard dims are zero-padded (PNG path)
        path = tmp_path / 'shard_p.spd'
        with shards.ShardWriter(str(path), 32, 32, 1, compressed=True) as sw:
            small = np.full((16, 20), 7, np.uint8)
            sw.add('a.png', small, [0, 0, 1, 1], [[0, 0]])
        loader = NativeBatchLoader(str(path), batch_size=1, shuffle=False,
                                   drop_last=False)
        batch = next(iter(loader))
        f = batch['frame'][0]
        assert (f[:16, :20] == 7).all()
        assert (f[16:, :] == 0).all() and (f[:, 20:] == 0).all()
        loader.close()


class TestHostCrop:
    """Host-crop mode parity: the C++ workers' box math + bilinear resample
    must match the device path (ops.crop.crop_resize) on the same frames."""

    def _write(self, path, n=6, h=120, w=160, compressed=False):
        rng = np.random.default_rng(3)
        frames, bboxes = [], []
        with shards.ShardWriter(str(path), h, w, 5,
                                compressed=compressed) as sw:
            for i in range(n):
                frame = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
                x1, y1 = rng.uniform(5, 60), rng.uniform(5, 40)
                bw, bh = rng.uniform(20, 80), rng.uniform(20, 60)
                bbox = np.array([x1, y1, x1 + bw, y1 + bh], np.float32)
                kp = rng.uniform(0, 64, (5, 2)).astype(np.float32)
                sw.add(f'img{i:03d}.jpg', frame, bbox, kp,
                       rng.normal(size=4).astype(np.float32),
                       rng.normal(size=3).astype(np.float32))
                frames.append(frame)
                bboxes.append(bbox)
        return np.stack(frames), np.stack(bboxes)

    @pytest.mark.parametrize('compressed', [False, True])
    def test_matches_device_crop(self, tmp_path, lib, compressed):
        import jax.numpy as jnp

        from esa_pose_estimation_tpu.ops import crop as crop_ops

        path = tmp_path / f'shard_hc_{compressed}.spd'
        frames, bboxes = self._write(path, compressed=compressed)
        h, w = frames.shape[1:]
        out = 32
        ref_crops, ref_rates, ref_origins = crop_ops.crop_resize(
            jnp.asarray(frames, jnp.float32), jnp.asarray(bboxes), out,
            img_w=w, img_h=h)
        loader = NativeBatchLoader(str(path), batch_size=6, shuffle=False,
                                   drop_last=False, n_threads=2,
                                   crop_size=out)
        batch = next(iter(loader))
        assert batch['crop'].shape == (6, out, out)
        assert 'frame' not in batch
        np.testing.assert_allclose(batch['rate'], np.asarray(ref_rates),
                                   rtol=1e-6)
        np.testing.assert_allclose(batch['origin'],
                                   np.asarray(ref_origins, np.float32))
        # f32-vs-f64 sample-coordinate rounding: sub-0.05-greylevel slack
        np.testing.assert_allclose(batch['crop'], np.asarray(ref_crops),
                                   atol=0.05)
        loader.close()

    def test_box_spilling_frame_edges(self, tmp_path, lib):
        """Boxes whose 1.05x square expansion exceeds the frame exercise
        the clamp-shift branches of the C++ box rule."""
        import jax.numpy as jnp

        from esa_pose_estimation_tpu.ops import crop as crop_ops

        h, w, out = 60, 80, 16
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 255, size=(4, h, w), dtype=np.uint8)
        bboxes = np.array([
            [0., 0., 50., 30.],        # top-left spill
            [40., 30., 79., 59.],      # bottom-right spill
            [1., 1., 79., 59.],        # larger than the frame
            [30., 20., 45., 35.],      # interior
        ], np.float32)
        path = tmp_path / 'shard_edges.spd'
        with shards.ShardWriter(str(path), h, w, 1) as sw:
            for i in range(4):
                sw.add(f'img{i:03d}.jpg', frames[i], bboxes[i], [[0., 0.]])
        ref_crops, ref_rates, ref_origins = crop_ops.crop_resize(
            jnp.asarray(frames, jnp.float32), jnp.asarray(bboxes), out,
            img_w=w, img_h=h)
        loader = NativeBatchLoader(str(path), batch_size=4, shuffle=False,
                                   drop_last=False, crop_size=out)
        batch = next(iter(loader))
        np.testing.assert_allclose(batch['rate'], np.asarray(ref_rates),
                                   rtol=1e-6)
        np.testing.assert_allclose(batch['origin'],
                                   np.asarray(ref_origins, np.float32))
        np.testing.assert_allclose(batch['crop'], np.asarray(ref_crops),
                                   atol=0.05)
        loader.close()


def test_truncated_shard_raises_not_silent_epoch_end(tmp_path):
    """An I/O error mid-epoch must raise, not masquerade as a clean
    (short) epoch — silent truncation corrupts steps_per_epoch/LR."""
    from esa_pose_estimation_tpu.data import shards
    from esa_pose_estimation_tpu.data.native_loader import NativeBatchLoader

    path = str(tmp_path / 'trunc.spd1')
    shards.write_synthetic_shard(path, 8, height=32, width=48)
    full = os.path.getsize(path)
    with open(path, 'r+b') as f:
        f.truncate(full - 1000)       # chop the tail off the last records

    loader = NativeBatchLoader(path, 2, n_threads=2, shuffle=False)
    with pytest.raises(RuntimeError, match='decode error|I/O'):
        for _ in loader:
            pass
    loader.close()
