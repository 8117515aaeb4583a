"""data_load5-equivalent mixed train+real_test split (VERDICT r1 missing #5).

The reference's best real-image score came from training on a pickle that
mixes synthetic-train and real_test records, routing each image by the
filename-length rule (data_load5.py:110-113) and normalizing at mean 0.5
(data_load5.py:80-88).  These tests cover the path rule, the loader flow,
and the norm variant flowing through build_batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.data import pipeline as data_pipeline
from esa_pose_estimation_tpu.data import speed as speed_data


def _write_png(path, value, hw=(24, 32)):
    from PIL import Image
    arr = np.full(hw, value, np.uint8)
    Image.fromarray(arr, mode='L').save(path)


@pytest.fixture
def mixed_root(tmp_path):
    (tmp_path / 'train').mkdir()
    (tmp_path / 'real_test').mkdir()
    _write_png(tmp_path / 'train' / 'img000007.jpg'.replace('jpg', 'png'),
               100)
    _write_png(tmp_path / 'real_test' / 'img000007_real.png', 200)

    k3 = np.random.default_rng(0).normal(size=(30, 3)).astype(np.float32)
    k2 = np.random.default_rng(1).uniform(2, 20, (30, 2)).astype(np.float32)
    K = np.eye(3, dtype=np.float32)
    recs = []
    for name in ('img000007.png', 'img000007_real.png'):
        recs.append({'rgb_pth': name, 'bbox': [2.0, 2.0, 30.0, 22.0],
                     'sift': k2, 'sift3d': k3, 'K': K,
                     'qua': np.array([1, 0, 0, 0], np.float32),
                     'RT': np.hstack([np.eye(3), np.ones((3, 1))]).astype(
                         np.float32)})
    pkl = tmp_path / 'mixed.pkl'
    speed_data.save_pickle_records(str(pkl), recs)
    return tmp_path, pkl


def test_filename_length_routing(mixed_root):
    root, pkl = mixed_root
    recs = speed_data.records_from_pickle_mixed(str(pkl), str(root))
    # 'img000007.png' is 13 chars -> train/; the _real name -> real_test/
    assert recs[0].image_path.endswith('train/img000007.png')
    assert recs[1].image_path.endswith('real_test/img000007_real.png')
    # both resolve to existing files with the expected content
    assert speed_data.read_gray_image(recs[0].image_path)[0, 0] == 100
    assert speed_data.read_gray_image(recs[1].image_path)[0, 0] == 200


def test_mixed_records_flow_through_loader_and_build_batch(mixed_root):
    root, pkl = mixed_root
    recs = speed_data.records_from_pickle_mixed(str(pkl), str(root))
    loader = speed_data.BatchLoader(recs, batch_size=2, shuffle=False,
                                    frame_hw=(24, 32))
    batch = next(iter(loader))
    assert batch['frame'].shape == (2, 24, 32)
    # frames came from the two different directories
    assert batch['frame'][0].max() == 100 and batch['frame'][1].max() == 200

    out = data_pipeline.build_batch(
        jnp.asarray(batch['frame']), jnp.asarray(batch['bbox']),
        jnp.asarray(batch['keypoints_2d']), jax.random.PRNGKey(0),
        crop_size=32, train=False, norm_mean=0.5)
    assert out['image'].shape == (2, 32, 32, 1)
    # constant-100 frame normalized at mean .5/std .229:
    want = (100 / 255.0 - 0.5) / 0.229
    inner = np.asarray(out['image'][0, 8:24, 8:24, 0])
    np.testing.assert_allclose(inner, want, atol=1e-4)


def test_norm_mean_changes_build_batch_output(mixed_root):
    root, pkl = mixed_root
    recs = speed_data.records_from_pickle_mixed(str(pkl), str(root))
    loader = speed_data.BatchLoader(recs, batch_size=2, shuffle=False,
                                    frame_hw=(24, 32))
    batch = next(iter(loader))
    args = (jnp.asarray(batch['frame']), jnp.asarray(batch['bbox']),
            jnp.asarray(batch['keypoints_2d']), jax.random.PRNGKey(0))
    a = data_pipeline.build_batch(*args, crop_size=32, train=False,
                                  norm_mean=0.449)
    b = data_pipeline.build_batch(*args, crop_size=32, train=False,
                                  norm_mean=0.5)
    diff = np.asarray(a['image'] - b['image'])
    np.testing.assert_allclose(diff, (0.5 - 0.449) / 0.229, atol=1e-5)


def test_loader_surfaces_worker_errors_and_releases_on_break(tmp_path):
    """A bad record must raise in the consumer (not hang the train loop),
    and abandoning the iterator early must not deadlock the producer."""
    import numpy as np
    from PIL import Image
    from esa_pose_estimation_tpu.data import speed

    good = tmp_path / 'ok.png'
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(good)

    def rec(path):
        return speed.Record(
            image_path=str(path),
            bbox=np.array([1, 1, 6, 6], np.float32),
            keypoints_2d=None,
            keypoints_3d=np.zeros((4, 3), np.float32),
            K=np.eye(3, dtype=np.float32),
            quat=None, trans=None, name='x')

    bad = [rec(good), rec(tmp_path / 'missing.png')]
    loader = speed.BatchLoader(bad, batch_size=2, shuffle=False,
                               frame_hw=(8, 8))
    with pytest.raises(FileNotFoundError):
        for _ in loader:
            pass

    many = [rec(good) for _ in range(8)]
    loader2 = speed.BatchLoader(many, batch_size=2, shuffle=False,
                                frame_hw=(8, 8), prefetch=1)
    for b in loader2:
        assert b['frame'].dtype == np.uint8
        break                    # abandon early; producer must release
    # a fresh epoch over the same loader still works
    assert sum(1 for _ in loader2) == 4
