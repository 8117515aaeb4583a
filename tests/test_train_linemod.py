"""LINEMOD trainer smoke tests: both modes run end-to-end and the loss
decreases over a short run."""

import json
import os

import pytest


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['heatmap', 'pvnet'])
def test_linemod_trainer_loss_decreases(tmp_path, mode):
    from esa_pose_estimation_tpu.cli import train_linemod
    workdir = str(tmp_path / mode)
    train_linemod.main([
        '--workdir', workdir, '--mode', mode, '--epochs', '2',
        '--steps-per-epoch', '8', '--batch-size', '4',
        '--crop-size', '64', '--num-keypoints', '5', '--lr', '2e-3'])
    log = open(os.path.join(workdir, 'log_cat.txt')).read().strip().split('\n')
    losses = [float(line.split('\t')[2]) for line in log[1:]]
    assert losses[-1] < losses[0], losses
    events = [json.loads(line) for line in
              open(os.path.join(workdir, 'events.jsonl'))]
    assert any(e['event'] == 'eval' for e in events)
