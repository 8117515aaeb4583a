"""LINEMOD real-data plumbing (VERDICT r1 missing #4).

Covers the data2/ pickle record mixing (fuse/render/real,
data_load3.py:89-121), the split-index rule, the fuse-mask decode rule,
the LINEMOD crop-box geometry against a numpy transcription of the
reference's int() logic (data_load3.py:155-205), and an end-to-end
train_linemod run on a tiny real-layout pkl + PNG fixture, including the
occlusion eval path (result_show.py:95-98).
"""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from esa_pose_estimation_tpu.data import linemod as lm
from esa_pose_estimation_tpu.ops import crop as crop_ops


def _save_pkl(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(obj, f)


def _write_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


FRAME_H, FRAME_W = 96, 128
CLS = 'cat'


def _record(rng, idx, prefix='real', n_kp=9):
    x1, y1 = rng.uniform(10, 40, 2)
    bbox = np.array([x1, y1, x1 + rng.uniform(20, 50),
                     y1 + rng.uniform(20, 40)], np.float32)
    return {
        'rgb_pth': f'{prefix}/{idx}.jpg.png',
        'dpt_pth': f'{prefix}_mask/{idx}.png',
        'bbox': bbox,
        'sift': rng.uniform(15, 80, (n_kp, 2)).astype(np.float32),
        'sift_3d': rng.normal(scale=0.05, size=(n_kp, 3)).astype(np.float32),
        'K': np.array([[120., 0., FRAME_W / 2], [0., 120., FRAME_H / 2],
                       [0., 0., 1.]], np.float32),
        'RT': np.hstack([np.eye(3), [[0.], [0.], [0.6]]]).astype(np.float32),
    }


@pytest.fixture
def data2(tmp_path):
    """Tiny data2/-layout fixture: 4 real (train 0,2 / test 1,3),
    2 render, 2 fuse, 2 occlusion records with matching PNGs."""
    rng = np.random.default_rng(0)
    root = tmp_path / 'LINEMOD'
    pkl = tmp_path / 'data2'

    real = [_record(rng, i) for i in range(4)]
    render = [_record(rng, i, 'render') for i in range(2)]
    fuse = [_record(rng, i, 'fuse') for i in range(2)]
    for r in fuse:
        r['rgb_pth'] = f'fuse/f{r["rgb_pth"].split("/")[1]}'
    occ = [_record(rng, i, 'occ') for i in range(2)]

    for des in real + render + fuse + occ:
        img = (rng.random((FRAME_H, FRAME_W, 3)) * 255).astype(np.uint8)
        _write_img(str(root / des['rgb_pth']), img)
        if os.path.basename(des['rgb_pth']).startswith('f'):
            # fuse mask: per-class index map (cat -> index 2 -> value 3)
            m = np.zeros((FRAME_H, FRAME_W), np.uint8)
            m[10:40, 10:40] = lm.FUSE_CLS_ORDER.index(CLS) + 1
            m[40:60, 40:60] = 5  # another class
        else:
            m = np.zeros((FRAME_H, FRAME_W, 3), np.uint8)
            m[20:50, 20:50] = 255
        _write_img(str(root / des['dpt_pth']), m)

    _save_pkl(str(pkl / f'{CLS}_real.pkl'), real)
    _save_pkl(str(pkl / f'{CLS}_train.pkl'),
              [(f'whatever/{i}.jpg',) for i in (0, 2)])
    _save_pkl(str(pkl / f'{CLS}_test.pkl'),
              [(f'whatever/{i}.jpg',) for i in (1, 3)])
    _save_pkl(str(pkl / f'{CLS}_render.pkl'), render)
    _save_pkl(str(pkl / f'{CLS}_fuse.pkl'), fuse)
    _save_pkl(str(pkl / 'occ' / f'{CLS}_real.pkl'), occ)
    return str(pkl), str(root), real, render, fuse, occ


def test_split_index_rule():
    assert lm.split_index(('a/b/0017.jpg', 'x')) == 17
    assert lm.split_index('rgb/42.png') == 42


def test_mixed_record_order(data2):
    pkl, root, real, render, fuse, occ = data2
    mixed = lm.load_mixed_train_records(pkl, CLS)
    # real-train (indices 0, 2) + render + fuse, in that order
    assert len(mixed) == 2 + 2 + 2
    assert mixed[0]['rgb_pth'] == real[0]['rgb_pth']
    assert mixed[1]['rgb_pth'] == real[2]['rgb_pth']
    assert mixed[2]['rgb_pth'].startswith('render/')
    assert mixed[4]['rgb_pth'].startswith('fuse/')
    # flags drop their sources
    assert len(lm.load_mixed_train_records(pkl, CLS, use_fuse=False)) == 4
    assert len(lm.load_mixed_train_records(pkl, CLS, use_render=False)) == 4
    test = lm.load_real_split(pkl, CLS, 'test')
    assert [t['rgb_pth'] for t in test] == [real[1]['rgb_pth'],
                                            real[3]['rgb_pth']]
    assert len(lm.load_occlusion_records(pkl, CLS)) == 2


def test_render_cap(data2):
    pkl = data2[0]
    capped = lm.load_mixed_train_records(pkl, CLS, use_fuse=False,
                                         render_cap=1)
    assert len(capped) == 3  # 2 real-train + 1 render


def test_decode_class_mask_rules():
    idx = lm.FUSE_CLS_ORDER.index(CLS) + 1
    m = np.zeros((8, 8), np.uint8)
    m[:2, :2] = idx
    m[4:, 4:] = idx + 3
    out = lm.decode_class_mask(m, 'fuse/f001.jpg', CLS)
    assert out[:2, :2].all() and not out[4:, 4:].any()
    # real path: any-channel nonzero
    m3 = np.zeros((8, 8, 3), np.uint8)
    m3[1, 1, 2] = 7
    out3 = lm.decode_class_mask(m3, 'real/001.jpg', CLS)
    assert out3[1, 1] == 1 and out3.sum() == 1
    # grayscale real mask
    out1 = lm.decode_class_mask(m, 'real/001.jpg', CLS)
    assert out1[:2, :2].all() and out1[4:, 4:].all()


def _reference_linemod_box(bbox, scale, img_w, img_h):
    """Direct numpy transcription of data_load3.py:155-205 (the oracle)."""
    x, y, w, h = [float(v) for v in bbox]
    c0 = int((x + w) / 2)
    c1 = int((y + h) / 2)
    size = int(max(scale, max(w - x, h - y)) / 2)
    x_new = int(c0 - 1.1 * size)
    y_new = int(c1 - 1.1 * size)
    w_new = int(c0 + 1.1 * size)
    h_new = int(c1 + 1.1 * size)
    if (w_new - x_new) != (h_new - y_new):
        h_new = y_new + (w_new - x_new)
    if x_new < 0:
        w_new -= x_new
        x_new = 0
    if y_new < 0:
        h_new -= y_new
        y_new = 0
    if w_new > img_w:
        x_new = x_new + img_w - w_new
        w_new = img_w
    if h_new > img_h:
        y_new = y_new + img_h - h_new
        h_new = img_h
    down = h_new - y_new
    left = w_new - x_new
    size = max(scale, max(left, down))
    if size > left:
        dis = size - left
        if w_new + dis < img_w:
            w_new += dis
        else:
            x_new -= dis
            if x_new < 0:
                w_new -= x_new
                x_new = 0
    if size > down:
        dis = size - down
        if h_new + dis < img_h:
            h_new += dis
        else:
            y_new -= dis
            if y_new < 0:
                h_new -= y_new
                y_new = 0
    return x_new, y_new, w_new, h_new, size


def test_adjust_bbox_linemod_matches_reference_transcription():
    rng = np.random.default_rng(1)
    scale, img_w, img_h = 128, 640, 480
    boxes = []
    for _ in range(200):
        x1 = rng.uniform(-20, img_w - 10)
        y1 = rng.uniform(-20, img_h - 10)
        boxes.append([x1, y1, x1 + rng.uniform(5, 400),
                      y1 + rng.uniform(5, 400)])
    boxes = np.asarray(boxes, np.float32)
    origin, crop_sizes, size = crop_ops.adjust_bbox_linemod(
        jnp.asarray(boxes), img_w, img_h, min_size=scale)
    origin = np.asarray(origin)
    crop_sizes = np.asarray(crop_sizes)
    size = np.asarray(size)
    for i, b in enumerate(boxes):
        xn, yn, wn, hn, s = _reference_linemod_box(b, scale, img_w, img_h)
        assert origin[i, 0] == xn and origin[i, 1] == yn, (i, b)
        assert crop_sizes[i, 0] == wn - xn, (i, b)
        assert crop_sizes[i, 1] == hn - yn, (i, b)
        assert size[i] == s, (i, b)


def test_expand_box_int_matches_python_float_semantics():
    """Exhaustive check of the exact-integer ``int(c ± k*half)`` rule
    against Python f64 arithmetic for every half in [0, 2000] and both
    reference margins (1.05 ESA, 1.1 LINEMOD)."""
    halves = np.arange(0, 2001, dtype=np.int32)
    for k in (1.05, 1.1):
        for c in (0, 7, 500):
            c_arr = jnp.full_like(jnp.asarray(halves), c)
            sub, _, add, _ = crop_ops._expand_box_int(
                c_arr, c_arr, jnp.asarray(halves), k)
            want_sub = np.array([int(c - k * float(h)) for h in halves])
            want_add = np.array([int(c + k * float(h)) for h in halves])
            np.testing.assert_array_equal(np.asarray(sub), want_sub,
                                          err_msg=f'k={k} c={c} sub')
            np.testing.assert_array_equal(np.asarray(add), want_add,
                                          err_msg=f'k={k} c={c} add')


def test_train_linemod_e2e_real_layout(data2, tmp_path):
    """cli/train_linemod consumes the real-layout fixture end-to-end:
    record mixing -> host loader -> device crop -> train step -> test-split
    eval -> occlusion eval file."""
    pkl, root, *_ = data2
    from esa_pose_estimation_tpu.cli import train_linemod as tl
    res = tl.main(['--workdir', str(tmp_path / 'run'), '--cls', CLS,
                   '--mode', 'heatmap', '--epochs', '1', '--batch-size', '2',
                   '--crop-size', '32', '--pkl-dir', pkl,
                   '--image-root', root, '--frame-h', str(FRAME_H),
                   '--frame-w', str(FRAME_W),
                   '--occ-pkl-dir', pkl, '--occ-image-root', root])
    for k in ('projection_2d', 'add', 'cm_degree_5',
              'occ_projection_2d', 'occ_add', 'occ_cm_degree_5'):
        assert k in res and 0.0 <= res[k] <= 1.0, (k, res)
    occ_file = tmp_path / 'run' / 'occ_result.txt'
    assert occ_file.exists() and CLS in occ_file.read_text()


def test_train_linemod_e2e_real_layout_augmented(data2, tmp_path):
    """--augment runs the PVNet augmentation chain (occlusion mask-out,
    instance rotation, crop_resize_instance_v2, flip, add_noise) inside
    the jitted real-data step, for BOTH formulations, and the loss stays
    finite (linemod_dataset.py:256-293 wiring, VERDICT r2 item 4)."""
    pkl, root, *_ = data2
    from esa_pose_estimation_tpu.cli import train_linemod as tl
    for mode in ('heatmap', 'pvnet'):
        res = tl.main(['--workdir', str(tmp_path / f'run_{mode}'),
                       '--cls', CLS, '--mode', mode, '--epochs', '1',
                       '--batch-size', '2', '--crop-size', '32',
                       '--pkl-dir', pkl, '--image-root', root,
                       '--frame-h', str(FRAME_H), '--frame-w', str(FRAME_W),
                       '--augment'])
        assert all(0.0 <= res[k] <= 1.0
                   for k in ('projection_2d', 'add', 'cm_degree_5')), res
        log = (tmp_path / f'run_{mode}' / f'log_{CLS}.txt').read_text()
        loss = float(log.strip().splitlines()[-1].split('\t')[2])
        assert np.isfinite(loss), log


def test_decode_class_mask_builder_convention():
    # db_builder fuse records: rgb_pth 'fuse/{k}_rgb.jpg' (basename does
    # NOT start with 'f') + rnd_typ='fuse'.  Both the explicit rnd_typ and
    # the reference's relative-path-first-char fallback must pick the fuse
    # rule; a basename check would not.
    idx = lm.FUSE_CLS_ORDER.index(CLS) + 1
    m = np.zeros((8, 8), np.uint8)
    m[:2, :2] = idx
    m[4:, 4:] = idx + 3
    by_typ = lm.decode_class_mask(m, 'fuse/3_rgb.jpg', CLS, rnd_typ='fuse')
    by_path = lm.decode_class_mask(m, 'fuse/3_rgb.jpg', CLS)
    for out in (by_typ, by_path):
        assert out[:2, :2].all() and not out[4:, 4:].any()
    # explicit rnd_typ wins over a misleading path
    real = lm.decode_class_mask(m, 'fuse/3_rgb.jpg', CLS, rnd_typ='real')
    assert real[4:, 4:].all()
