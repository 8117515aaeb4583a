"""Full-pipeline dress rehearsal on reference-format on-disk data.

Every stage of the production chain is parity-tested in isolation
elsewhere; this suite composes them END TO END FROM DISK in one session,
the exact route real SPEED data takes (VERDICT r4 item 1 — the
reference workflow is main.py:237-424 -> demo.py -> val.py:94-336):

  data/speed_gen.export_reference_layout
      images/train|test|real_test JPEGs + train|test|real_test.{json,pkl}
      in the reference's exact on-disk layout (utils.py:42-65 JSON schema,
      data_load4.py:90-101 pickle ``des`` schema)
  -> data/speed.records_from_pickle        (reference pickle ingest)
  -> data/shards.write_shard_from_records  (SPD1 packed shard)
  -> cli/train --train-shard               (C++ native loader -> sharded
                                            step, eval epochs, best gates)
  -> cli/evaluate                          (labeled SPEED scores from the
                                            best_rotate checkpoint)
  -> cli/submit                            (test + real_test partitions
                                            -> leaderboard CSV)

Scale is reduced (tiny net, 384x240 frames) so the rehearsal runs in the
slow CPU tier; scripts/dress_rehearsal.py runs the same chain at full
SPEED scale (1920x1200, flagship net) on the TPU and records wall-clock
per stage in QUALITY.md.
"""

import csv
import json
import os
import pickle

import numpy as np
import pytest

N_TRAIN, N_TEST, N_REAL = 48, 8, 4
H, W, N_KP = 240, 384, 6


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    """The reference-layout dataset, exported once for the module."""
    from esa_pose_estimation_tpu.data import speed_gen
    root = str(tmp_path_factory.mktemp('speed_layout'))
    out = speed_gen.export_reference_layout(
        root, n_train=N_TRAIN, n_test=N_TEST, n_real_test=N_REAL,
        height=H, width=W, n_kp=N_KP, seed=0, batch=8)
    return out


@pytest.fixture(scope='module')
def trained(dataset, tmp_path_factory):
    """Shard the train pickle and run cli/train over the native loader
    for 5 epochs (epoch%5==4 triggers the eval -> best_tran/best_rotate
    checkpoints exist for the downstream drivers)."""
    from esa_pose_estimation_tpu.cli import train as train_cli
    from esa_pose_estimation_tpu.data import shards, speed

    records = speed.records_from_pickle(
        dataset['train_pkl'], dataset['train_images'])
    shard = str(tmp_path_factory.mktemp('shards') / 'train.spd1')
    n = shards.write_shard_from_records(shard, records, height=H, width=W,
                                        compressed=True)
    assert n == N_TRAIN
    meta = shards.read_meta(shard)
    assert (meta.n_records, meta.height, meta.width, meta.n_kp) == \
        (N_TRAIN, H, W, N_KP)

    workdir = str(tmp_path_factory.mktemp('run') / 'esa')
    train_cli.main([
        '--workdir', workdir, '--tiny', '--epochs', '5',
        '--batch-size', '8', '--crop-size', '32',
        '--train-shard', shard, '--loader-threads', '2',
        '--no-panels', '--log-every', '3',
        # round-4 rehearsal lesson: the per-epoch eval (and the best
        # gates) must measure HELD-OUT frames, with geometric
        # augmentation as the small-dataset overfit control
        '--test-pkl', dataset['test_pkl'],
        '--image-root', dataset['test_images'],
        '--augment-geom', '--eval-every', '2'])
    return workdir


class TestReferenceLayout:
    """The exporter writes the layout the reference stack consumes."""

    def test_directory_structure(self, dataset):
        root = dataset['root']
        for split in ('train', 'test', 'real_test'):
            assert os.path.isdir(os.path.join(root, 'images', split))
            assert os.path.exists(os.path.join(root, f'{split}.json'))
            assert os.path.exists(os.path.join(root, f'{split}.pkl'))

    def test_json_schema(self, dataset):
        """utils.py:42-65: labeled splits carry filename + quaternion +
        translation; unlabeled real_test carries filenames only."""
        with open(dataset['train_json']) as f:
            train_meta = json.load(f)
        assert len(train_meta) == N_TRAIN
        e = train_meta[0]
        assert set(e) == {'filename', 'q_vbs2tango', 'r_Vo2To_vbs_true'}
        assert len(e['q_vbs2tango']) == 4
        assert len(e['r_Vo2To_vbs_true']) == 3
        with open(dataset['real_test_json']) as f:
            real_meta = json.load(f)
        assert len(real_meta) == N_REAL
        assert set(real_meta[0]) == {'filename'}

    def test_pickle_des_schema(self, dataset):
        """data_load4.py:90-101 keys; real_test is unlabeled like the
        leaderboard split."""
        with open(dataset['train_pkl'], 'rb') as f:
            des = pickle.load(f)[0]
        assert set(des) >= {'rgb_pth', 'bbox', 'sift', 'sift3d', 'K',
                            'qua', 'RT'}
        assert np.asarray(des['sift']).shape == (N_KP, 2)
        assert np.asarray(des['sift3d']).shape == (N_KP, 3)
        assert np.asarray(des['RT']).shape == (3, 4)
        with open(dataset['real_test_pkl'], 'rb') as f:
            rdes = pickle.load(f)[0]
        assert 'qua' not in rdes and 'RT' not in rdes and 'sift' not in rdes

    def test_filename_length_routing(self, dataset):
        """data_load5.py:110-113 routes records by the 13-char synthetic
        name convention; the exporter must respect it on both sides."""
        with open(dataset['train_pkl'], 'rb') as f:
            train_names = [d['rgb_pth'] for d in pickle.load(f)]
        assert all(len(n) == 13 for n in train_names)
        with open(dataset['real_test_pkl'], 'rb') as f:
            real_names = [d['rgb_pth'] for d in pickle.load(f)]
        assert all(len(n) != 13 for n in real_names)

    def test_images_decode_and_match_bbox(self, dataset):
        from esa_pose_estimation_tpu.data import speed
        records = speed.records_from_pickle(
            dataset['train_pkl'], dataset['train_images'])
        frame = speed.read_gray_image(records[0].image_path)
        assert frame.shape == (H, W) and frame.dtype == np.uint8
        x1, y1, x2, y2 = records[0].bbox
        assert 0 <= x1 < x2 <= W and 0 <= y1 < y2 <= H
        # the target region actually carries signal (keypoint blobs)
        inner = frame[int(y1):int(y2), int(x1):int(x2)]
        assert inner.max() > 2 * max(1, int(np.median(frame)))


class TestTrainedRun:
    def test_logs_and_checkpoints(self, trained):
        lines = open(os.path.join(trained, 'log_esa.txt')).read().strip()
        rows = lines.split('\n')
        assert len(rows) == 6                     # header + 5 epochs
        losses = [float(r.split('\t')[2]) for r in rows[1:]]
        assert all(np.isfinite(l) for l in losses)
        ckdir = os.path.join(trained, 'net_esa')
        for alias in ('last', 'best_tran', 'best_rotate'):
            assert os.path.exists(os.path.join(ckdir, alias)), alias

    def test_eval_event_logged(self, trained):
        events = [json.loads(l) for l in
                  open(os.path.join(trained, 'events.jsonl'))]
        evals = [e for e in events if e['event'] == 'eval']
        # --eval-every 2 over 5 epochs -> held-out evals after epochs 2, 4
        assert [e['epoch'] for e in evals] == [2, 4]
        assert all(np.isfinite(e['speed']) for e in evals)


class TestEvaluateDriver:
    def test_labeled_scores_from_best_checkpoint(self, dataset, trained):
        from esa_pose_estimation_tpu.cli import evaluate as eval_cli
        result = eval_cli.main([
            '--workdir', trained, '--test-pkl', dataset['test_pkl'],
            '--image-root', dataset['test_images'],
            '--checkpoint', 'best_rotate', '--tiny',
            '--batch-size', str(N_TEST), '--crop-size', '32'])
        assert np.isfinite(result['score_t'])
        assert np.isfinite(result['score_r'])
        assert result['score_t'] >= 0 and result['score_r'] >= 0
        # demo.py:358-363 load-log row appended
        load_log = os.path.join(trained, 'load', 'load_esa.txt')
        row = open(load_log).read().strip().split('\t')
        assert row[0] == 'esa' and row[1] == 'best_rotate'


class TestSubmitDriver:
    def test_leaderboard_csv(self, dataset, trained):
        from esa_pose_estimation_tpu.cli import submit as submit_cli
        path = submit_cli.main([
            '--workdir', trained, '--tiny',
            '--test-pkl', dataset['test_pkl'],
            '--image-root', dataset['test_images'],
            '--real-test-pkl', dataset['real_test_pkl'],
            '--real-image-root', dataset['real_test_images'],
            '--checkpoint', 'best_rotate', '--batch-size', '8',
            '--crop-size', '32', '--suffix', 'rehearsal'])
        with open(path) as f:
            rows = list(csv.reader(f))
        assert len(rows) == N_TEST + N_REAL
        names = [r[0] for r in rows]
        # one row per record, partition filenames preserved, values finite
        with open(dataset['test_pkl'], 'rb') as f:
            test_names = [d['rgb_pth'] for d in pickle.load(f)]
        with open(dataset['real_test_pkl'], 'rb') as f:
            real_names = [d['rgb_pth'] for d in pickle.load(f)]
        assert names == test_names + real_names
        for r in rows:
            assert len(r) == 8                      # name + quat(4) + t(3)
            vals = np.asarray([float(v) for v in r[1:]])
            assert np.all(np.isfinite(vals))
            # unit quaternion (val.py exports normalized orientation)
            assert abs(np.linalg.norm(vals[:4]) - 1.0) < 1e-3
