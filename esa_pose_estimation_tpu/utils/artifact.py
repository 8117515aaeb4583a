"""Portable inference artifact: one compressed ``.npz`` of trained weights.

An orbax train checkpoint carries the full train state (f32 params +
Adam moments + batch stats, ~116 MB for the flagship) in a sharded OCDBT
directory — the right format for resume, the wrong one for shipping a
reproducible evaluation artifact in the repo. This module exports the
inference-relevant subset — params in bfloat16 (the dtype the serving
conv stack computes in anyway) and batch_stats in f32 — as a single
~15 MB npz that `cli/eval_synthetic --artifact` (and any API user) can
load without orbax, so the QUALITY.md held-out table re-derives from a
fresh clone in one command (VERDICT r4 item 4).

The reference's equivalent is the torch.save state_dict consumed by
demo.py:418/val.py; this is that role with an explicit
serving-precision contract.

Format: flat npz. ``meta`` holds a JSON dict; every other entry is
``p:<slash/joined/path>`` (param leaf, bf16 stored as a uint16 bitcast
— numpy has no native bfloat16 in npz) or ``s:<path>`` (batch-stat
leaf, f32).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

_PARAM, _STAT = 'p:', 's:'


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, 'items'):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_inference_artifact(path: str, params, batch_stats,
                            meta: dict | None = None) -> None:
    """Write params (as bf16) + batch_stats (f32) + meta to ``path``."""
    payload = {'meta': np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)}
    for k, v in _flatten(params).items():
        b16 = np.asarray(jnp.asarray(v, jnp.bfloat16))
        payload[_PARAM + k] = b16.view(np.uint16)
    for k, v in _flatten(batch_stats).items():
        payload[_STAT + k] = np.asarray(v, np.float32)
    np.savez_compressed(path, **payload)


def load_inference_artifact(path: str):
    """Returns ``(variables, meta)`` with ``variables`` ready for
    ``model.apply``: params restored to f32 leaves (flax params are f32
    by contract; activations cast to the model dtype internally)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z['meta']).decode()) if 'meta' in z else {}
        params_flat, stats_flat = {}, {}
        for k in z.files:
            if k.startswith(_PARAM):
                params_flat[k[len(_PARAM):]] = jnp.asarray(
                    z[k].view(np.uint16)).view(jnp.bfloat16
                                               ).astype(jnp.float32)
            elif k.startswith(_STAT):
                stats_flat[k[len(_STAT):]] = jnp.asarray(z[k])
    variables = {'params': _unflatten(params_flat),
                 'batch_stats': _unflatten(stats_flat)}
    return variables, meta


def main(argv=None):
    """Export an artifact from an orbax training checkpoint:

    python -m esa_pose_estimation_tpu.utils.artifact --workdir runs/esa_syn \
        --out artifacts/esa_syn_best.npz [--checkpoint best_rotate] [--tiny]
    """
    import argparse
    import os

    import jax

    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.train import state as state_mod
    from esa_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--workdir', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--checkpoint', default='best_rotate')
    ap.add_argument('--crop-size', type=int, default=128)
    ap.add_argument('--tiny', action='store_true')
    args = ap.parse_args(argv)

    model_cfg = cfg_mod.hrnet_tiny() if args.tiny else cfg_mod.hrnet_esa()
    model = HRNet(model_cfg, dtype=jnp.bfloat16)
    st = state_mod.create_train_state(
        model, cfg_mod.TrainConfig(crop_size=args.crop_size),
        jax.random.PRNGKey(0), (1, args.crop_size, args.crop_size, 1))
    st, epoch = CheckpointManager(
        os.path.join(args.workdir, 'net_esa')).restore_required(
        args.checkpoint, st)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_inference_artifact(
        args.out, jax.device_get(st.params), jax.device_get(st.batch_stats),
        meta={'checkpoint': args.checkpoint, 'epoch': int(epoch - 1),
              'model': 'hrnet_tiny' if args.tiny else 'hrnet_esa',
              'crop_size': args.crop_size})
    print(f'wrote {args.out} '
          f'({os.path.getsize(args.out) / 1e6:.1f} MB, epoch {epoch - 1})')


if __name__ == '__main__':
    main()
