"""Reference-layout dataset exporter.

Writes a synthetic dataset in the EXACT on-disk layout the reference
stack consumes, so the full production chain — pickles -> packed shard ->
``cli/train --train-shard`` -> ``cli/evaluate`` -> ``cli/submit`` CSV —
can be dress-rehearsed end to end from disk (VERDICT r4 item 1):

* ``images/train|test|real_test/img%06d.jpg`` grayscale frames (SPEED's
  1920x1200 JPEG convention; size is a parameter for small-frame tests).
  Synthetic-partition names are exactly 13 characters (``img000001.jpg``)
  because the reference's mixed loader routes records by that length
  (data_load5.py:110-113); real_test names are deliberately longer.
* ``train.json`` / ``test.json`` / ``real_test.json`` competition
  metadata (utils.py:42-65 schema: ``filename``, ``q_vbs2tango``,
  ``r_Vo2To_vbs_true``; the unlabeled splits carry filenames only).
* ``train.pkl`` / ``test.pkl`` / ``real_test.pkl`` per-image record
  databases with the ``des`` schema the reference loaders index
  (data_load4.py:90-101): ``rgb_pth``, ``bbox``, ``sift`` (2D keypoint
  ground truth), ``sift3d`` (model points), ``K``, ``qua``, ``RT``.
  ``real_test.pkl`` is unlabeled (no ``qua``/``RT``/``sift``) like the
  leaderboard split.

The imagery is the synthetic SPEED stand-in from data/synthetic.py
(per-keypoint-distinct Gaussian blobs, poses from the SPEED depth
distribution), rendered in jitted batches on whatever backend is active.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.data import synthetic


def _render_split(key: jax.Array, points_3d: jnp.ndarray, n: int,
                  height: int, width: int, batch: int):
    """Yield (image uint8 (H,W), bbox, kp2d, quat, trans) per frame."""
    def _one(k):
        s = synthetic.make_sample(k, points_3d, height=height, width=width)
        # uint8 ON device: a full-frame f32 batch is 4x the bytes through
        # the device link (same rationale as shards.write_synthetic_shard)
        return s._replace(
            image=jnp.clip(s.image, 0, 255).astype(jnp.uint8))

    make = jax.jit(jax.vmap(_one))
    done = 0
    i = 0
    while done < n:
        keys = jax.random.split(jax.random.fold_in(key, i), batch)
        s = jax.device_get(make(keys))
        i += 1
        for j in range(min(batch, n - done)):
            yield (s.image[j],
                   np.asarray(s.bbox[j]), np.asarray(s.keypoints_2d[j]),
                   np.asarray(s.quat[j]), np.asarray(s.trans[j]))
            done += 1


def _rt_from(quat: np.ndarray, trans: np.ndarray) -> np.ndarray:
    from esa_pose_estimation_tpu.core import camera
    R = np.asarray(camera.quat_to_rotmat(jnp.asarray(quat)))
    return np.concatenate([R, trans.reshape(3, 1)], axis=1)  # (3, 4)


def export_reference_layout(root: str, n_train: int = 480,
                            n_test: int = 64, n_real_test: int = 32,
                            height: int = 1200, width: int = 1920,
                            n_kp: int = 30, seed: int = 0,
                            batch: int = 8, jpeg_quality: int = 95
                            ) -> dict:
    """Generate the dataset; returns paths of everything written."""
    from PIL import Image

    points_3d = synthetic.spacecraft_points(n_kp)
    K = np.asarray(synthetic.scaled_intrinsics(height, width))
    key = jax.random.PRNGKey(seed)

    splits = {'train': n_train, 'test': n_test, 'real_test': n_real_test}
    out = {'root': root}
    for si, (split, n) in enumerate(splits.items()):
        img_dir = os.path.join(root, 'images', split)
        os.makedirs(img_dir, exist_ok=True)
        labeled = split != 'real_test'
        meta, des_list = [], []
        for idx, (img, bbox, kp2d, quat, trans) in enumerate(
                _render_split(jax.random.fold_in(key, si), points_3d, n,
                              height, width, batch)):
            if split == 'real_test':
                # > 13 chars on purpose: the length-routing rule must
                # classify these as real-capture frames
                name = f'img{idx + 1:06d}real.jpg'
            else:
                name = f'img{idx + 1:06d}.jpg'
            Image.fromarray(img, mode='L').save(
                os.path.join(img_dir, name), quality=jpeg_quality)
            entry: dict = {'filename': name}
            if labeled:
                entry['q_vbs2tango'] = [float(v) for v in quat]
                entry['r_Vo2To_vbs_true'] = [float(v) for v in trans]
            meta.append(entry)
            des = {'rgb_pth': name,
                   'bbox': bbox.astype(np.float32),
                   'sift3d': np.asarray(points_3d, np.float32),
                   'K': K.astype(np.float32)}
            if labeled:
                des['sift'] = kp2d.astype(np.float32)
                des['qua'] = quat.astype(np.float32)
                des['RT'] = _rt_from(quat, trans).astype(np.float32)
            des_list.append(des)

        json_path = os.path.join(root, f'{split}.json')
        with open(json_path, 'w') as f:
            json.dump(meta, f)
        pkl_path = os.path.join(root, f'{split}.pkl')
        with open(pkl_path, 'wb') as f:
            pickle.dump(des_list, f)
        out[f'{split}_json'] = json_path
        out[f'{split}_pkl'] = pkl_path
        out[f'{split}_images'] = img_dir
    return out


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--root', required=True)
    ap.add_argument('--n-train', type=int, default=480)
    ap.add_argument('--n-test', type=int, default=64)
    ap.add_argument('--n-real-test', type=int, default=32)
    ap.add_argument('--height', type=int, default=1200)
    ap.add_argument('--width', type=int, default=1920)
    ap.add_argument('--n-kp', type=int, default=30)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args(argv)
    out = export_reference_layout(
        args.root, args.n_train, args.n_test, args.n_real_test,
        args.height, args.width, args.n_kp, args.seed, args.batch)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
