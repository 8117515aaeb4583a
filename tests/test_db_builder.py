"""Offline pkl DB builders + fuse composer (SURVEY §2 #27 / L8 gap):
raw LINEMOD-layout tree -> {cls}_{real,render,fuse,train,test}.pkl +
occ/{cls}_real.pkl -> consumed end-to-end by data.linemod loaders."""

import os
import pickle

import numpy as np
import pytest

from esa_pose_estimation_tpu.data import db_builder as dbb
from esa_pose_estimation_tpu.data import linemod as lm

CLS = 'cat'
H, W = 480, 640   # real frame size: projections sit near the LINEMOD
                  # principal point (325, 242), outside smaller fixtures


def _save_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _cube_vertices(side=0.06):
    s = side / 2
    g = np.array([-s, s])
    return np.array([[x, y, z] for x in g for y in g for z in g])


def _pose(rng):
    """Random small rotation + in-front translation."""
    a = rng.normal(scale=0.2, size=3)
    th = np.linalg.norm(a) + 1e-9
    k = a / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
    t = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                  rng.uniform(0.5, 0.8)])
    return np.hstack([R, t[:, None]]).astype(np.float32)


def _render_mask(RT, K, hw):
    """Blocky projected-cube mask: a filled bb8 bounding rectangle."""
    pts = dbb.project_K(_cube_vertices(), RT, K)
    m = np.zeros(hw, np.uint8)
    x1, y1 = np.clip(pts.min(0).astype(int), 0, None)
    x2, y2 = pts.max(0).astype(int)
    m[y1:y2 + 1, x1:x2 + 1] = 255
    return m


@pytest.fixture
def layout(tmp_path):
    """Tiny raw LINEMOD layout: 4 real frames (JPEGImages/mask/rot+tra),
    3 renders with RT pkls + depth masks, occlusion tree."""
    rng = np.random.default_rng(7)
    root = str(tmp_path / 'LM')
    db = lm.LineModModelDB()
    db.register(CLS, vertices=_cube_vertices())
    K = dbb.LINEMOD_K

    for k in range(4):  # real set
        RT = _pose(rng)
        m = _render_mask(RT, K, (H, W))
        _save_img(os.path.join(root, CLS, 'JPEGImages', f'{k:06d}.jpg'),
                  np.broadcast_to(m[..., None], (H, W, 3)).copy())
        _save_img(os.path.join(root, CLS, 'mask', f'{k:04d}.png'), m)
        pd = os.path.join(root, CLS, 'data')
        os.makedirs(pd, exist_ok=True)
        with open(os.path.join(pd, f'rot{k}.rot'), 'w') as f:
            f.write('3 3\n' + '\n'.join(
                ' '.join(f'{v:.7f}' for v in row) for row in RT[:, :3]))
        with open(os.path.join(pd, f'tra{k}.tra'), 'w') as f:
            f.write('1 3\n' + ' '.join(f'{v:.7f}' for v in RT[:, 3] * 100))

    rdir = os.path.join(root, 'renders', CLS)
    os.makedirs(rdir, exist_ok=True)
    for k in range(3):  # render set
        RT = _pose(rng)
        m = _render_mask(RT, K, (H, W))
        _save_img(os.path.join(rdir, f'{k}.jpg'),
                  np.broadcast_to(m[..., None], (H, W, 3)).copy())
        _save_img(os.path.join(rdir, f'{k}_depth.png'), m)
        with open(os.path.join(rdir, f'{k}_RT.pkl'), 'wb') as f:
            pickle.dump({'RT': RT}, f)

    # occlusion tree (2 frames, one missing pose -> skipped)
    for k in range(2):
        RT = _pose(rng)
        m = _render_mask(RT, K, (H, W))
        _save_img(os.path.join(root, 'RGB-D', 'rgb_noseg',
                               f'color_{k:05d}.png'),
                  np.broadcast_to(m[..., None], (H, W, 3)).copy())
        _save_img(os.path.join(root, 'masks', CLS, f'{k}.png'), m)
        if k == 0:
            pd = os.path.join(root, 'poses', 'Cat')
            os.makedirs(pd, exist_ok=True)
            with open(os.path.join(pd, f'rot{k}.rot'), 'w') as f:
                f.write('3 3\n' + '\n'.join(
                    ' '.join(f'{v:.7f}' for v in row) for row in RT[:, :3]))
            with open(os.path.join(pd, f'tra{k}.tra'), 'w') as f:
                f.write('1 3\n' + ' '.join(
                    f'{v:.7f}' for v in RT[:, 3] * 100))
    return root, db


class TestBuilders:
    def test_real_db_roundtrip(self, layout):
        root, db = layout
        recs = dbb.build_real_db(root, CLS, db, n_kp=8)
        assert len(recs) == 4
        loaded = lm._load_pkl(os.path.join(root, f'{CLS}_real.pkl'))
        assert len(loaded) == 4
        r = loaded[0]
        # pose text round-trip (cm -> m) and keypoint projection are
        # consistent: re-projecting sift_3d with the stored RT/K
        # reproduces the stored sift points
        np.testing.assert_allclose(
            dbb.project_K(r['sift_3d'], r['RT'], r['K']), r['sift'],
            atol=1e-3)
        # bbox encloses all projected mesh points
        pts = dbb.project_K(db.get_ply_model(CLS), r['RT'], r['K'])
        x1, y1, x2, y2 = r['bbox']
        assert x1 <= pts[:, 0].min() + 1 and x2 >= pts[:, 0].max() - 1
        assert y1 <= pts[:, 1].min() + 1 and y2 >= pts[:, 1].max() - 1

    def test_render_db(self, layout):
        root, db = layout
        recs = dbb.build_render_db(root, CLS, db, n_kp=8)
        assert len(recs) == 3
        assert all(r['rnd_typ'] == 'render' for r in recs)
        assert recs[0]['bbox'][2] > recs[0]['bbox'][0]

    def test_split_and_mixed_consumption(self, layout):
        root, db = layout
        real = dbb.build_real_db(root, CLS, db, n_kp=8)
        dbb.build_render_db(root, CLS, db, n_kp=8)
        train, test = dbb.build_split_pkls(real, root, CLS,
                                           test_fraction=0.5)
        assert len(train) == 2 and len(test) == 2
        # consumed by the data2/ loaders (split-index rule + mix order)
        mixed = lm.load_mixed_train_records(root, CLS, use_fuse=False)
        assert len(mixed) == 2 + 3           # real-train then renders
        assert [r['rnd_typ'] for r in mixed] == ['real'] * 2 + \
            ['render'] * 3
        test_recs = lm.load_real_split(root, CLS, 'test')
        assert len(test_recs) == 2

    def test_fuse_compose_and_collect(self, layout):
        root, db = layout
        n = dbb.compose_fuse_set(root, {CLS: os.path.join('renders', CLS)},
                                 n_images=3, frame_hw=(H, W), max_shift=6)
        assert n == 3
        recs = dbb.build_fuse_db(root, CLS, db, n_kp=8, min_px=10)
        assert len(recs) >= 1
        r = recs[0]
        assert r['rnd_typ'] == 'fuse'
        # decode_class_mask must recover the pasted object from the
        # composite mask (fuse rule: value == FUSE_CLS_ORDER index + 1)
        from PIL import Image
        m = np.asarray(Image.open(os.path.join(root, str(r['dpt_pth']))))
        # full relative path + rnd_typ, as the loader passes them — the
        # builder's fuse basenames are '{k}_rgb.jpg', so basename-based
        # fuse detection would silently take the wrong decode branch
        cls_mask = lm.decode_class_mask(m, str(r['rgb_pth']), CLS,
                                        rnd_typ=r['rnd_typ'])
        assert cls_mask.sum() >= 10
        # K-shift convention: projecting sift_3d with the shifted K lands
        # inside the pasted mask's bbox (data_utils.py:344-348)
        pts = dbb.project_K(r['sift_3d'], r['RT'], r['K'])
        x1, y1, x2, y2 = dbb.mask_to_bbox(cls_mask)
        pad = 12.0  # keypoints can sit slightly outside the blocky mask
        inside = (pts[:, 0] > x1 - pad) & (pts[:, 0] < x2 + pad) & \
                 (pts[:, 1] > y1 - pad) & (pts[:, 1] < y2 + pad)
        assert inside.mean() > 0.8

    def test_occlusion_db(self, layout):
        root, db = layout
        recs = dbb.build_occlusion_db(root, CLS, db, n_kp=8)
        assert len(recs) == 1                # frame 1 has no pose -> skip
        loaded = lm.load_occlusion_records(root, CLS)
        assert len(loaded) == 1
        assert loaded[0]['rgb_pth'].endswith('color_00000.png')

    def test_batch_loader_consumes_built_db(self, layout):
        root, db = layout
        real = dbb.build_real_db(root, CLS, db, n_kp=8)
        dbb.build_split_pkls(real, root, CLS, test_fraction=0.5)
        recs = lm.load_real_split(root, CLS, 'train')
        loader = lm.LinemodBatchLoader(recs, root, CLS, batch_size=2,
                                       shuffle=False, frame_hw=(H, W))
        b = next(iter(loader))
        assert b['frame'].shape == (2, H, W, 3)
        assert b['keypoints_2d'].shape == (2, 8, 2)
        assert b['mask'].sum() > 0
        assert 'R' in b and 't' in b
