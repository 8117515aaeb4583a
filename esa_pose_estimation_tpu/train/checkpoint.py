"""Checkpoint management with ``last`` / ``best_tran`` / ``best_rotate``
aliases.

TPU-native equivalent of the reference's torch.save dict checkpoints
(reference: main.py:176-204 save_model/load_model; metric-gated best
snapshots at main.py:408-417; eval loads 'best_rotate' at demo.py:418).
Uses orbax for the on-disk format; state is
{'params', 'batch_stats', 'opt_state', 'epoch'} mirroring the reference's
{'net', 'optim', 'epoch'}.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

LAST = 'last'
BEST_TRAN = 'best_tran'
BEST_ROTATE = 'best_rotate'


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if jax.process_count() > 1:
            # Multi-controller runs: state arrives here as host numpy
            # (fully-replicated arrays are device_get'd by the caller),
            # every process has its own directory, and each save must be
            # process-LOCAL — orbax's default save is a collective whose
            # completion barrier spans all processes, so the default
            # checkpointer deadlocks the pod if any process skips or
            # fails a save (observed: proc0 hung in the barrier while
            # proc1 had no file to rename).
            pid = jax.process_index()
            mp = ocp.options.MultiprocessingOptions(
                primary_host=pid, active_processes={pid},
                barrier_sync_key_prefix=f'ckpt_proc{pid}')
            self._ckptr = ocp.Checkpointer(
                ocp.PyTreeCheckpointHandler(), multiprocessing_options=mp)
        else:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def exists(self, name: str) -> bool:
        p = self._path(str(name))
        return os.path.exists(p) or os.path.exists(p + '.old')

    def restore_required(self, name: str, state):
        """restore(), but a MISSING checkpoint is an error.

        The plain restore's (state, 0) absence contract is right for
        training resume; eval/submission CLIs must not silently proceed
        on randomly-initialized weights (they would export a leaderboard
        CSV from noise with exit code 0).
        """
        if not self.exists(name):
            raise FileNotFoundError(
                f'checkpoint {name!r} not found under {self.directory} '
                f'(available: {sorted(os.listdir(self.directory))})')
        return self.restore(name, state)

    def save(self, name: str, state, epoch: int) -> None:
        """Save under an alias name ('last', 'best_tran', epoch number...).

        Crash-safe alias replacement: the new checkpoint is fully written
        under ``<name>.new`` first, then swapped in via directory renames.
        A plain force-overwrite deletes the old checkpoint before the new
        one is finalized, so a preemption mid-save would silently restart
        training from epoch 0 (and then clobber the best aliases).
        ``restore`` falls back to ``<name>.old`` for the rename window.
        """
        import shutil

        payload = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'epoch': epoch,
        }
        path = self._path(str(name))
        tmp, old = path + '.new', path + '.old'
        shutil.rmtree(tmp, ignore_errors=True)
        self._ckptr.save(tmp, jax.device_get(payload), force=True)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def restore(self, name: str, state):
        """Restore into an existing TrainState template.  Returns
        (state, next_epoch) or (state, 0) when absent (reference
        load_model returns 0 on a missing dir, main.py:185-195)."""
        path = self._path(str(name))
        if not os.path.exists(path):
            # crash window in save(): old alias renamed away, new not yet in
            if os.path.exists(path + '.old'):
                path = path + '.old'
            else:
                return state, 0
        template = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'epoch': 0,
        }
        payload = self._ckptr.restore(path, item=jax.device_get(template))
        state = state.replace(params=payload['params'],
                              batch_stats=payload['batch_stats'],
                              opt_state=payload['opt_state'])
        return state, int(payload['epoch']) + 1

    # Running best metrics are persisted in a sidecar so a crash resume
    # does NOT restart the gates at +/-inf — without this, the first eval
    # after a restart unconditionally overwrote the best aliases, i.e.
    # resume destroyed exactly the checkpoints it exists to protect.
    def _best_path(self) -> str:
        return os.path.join(self.directory, 'best_scores.json')

    def load_best(self) -> dict[str, float]:
        """The persisted running-best metric dict ({} on fresh runs)."""
        import json
        try:
            with open(self._best_path()) as f:
                return {str(k): float(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            return {}

    def store_best(self, best: dict[str, float]) -> None:
        """Atomically persist the running-best metric dict."""
        import json
        tmp = self._best_path() + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(best, f)
        os.replace(tmp, self._best_path())

    def save_rolling(self, state, epoch: int,
                     score_tran: float | None = None,
                     score_rotate: float | None = None,
                     best: dict[str, float] | None = None,
                     save_last: bool = True) -> dict[str, float]:
        """'last' every epoch + metric-gated best aliases
        (reference: main.py:408-417).  ``best`` carries the running minima
        (seed it with :meth:`load_best` when resuming); returns the
        updated dict, which is also persisted for crash resume.
        ``save_last=False`` skips the 'last' alias for callers that
        already saved it before a crash-prone eval."""
        best = dict(best or {})
        if save_last:
            self.save(LAST, state, epoch)
        # The sidecar is persisted BEFORE each alias save: a preemption in
        # between then leaves a sidecar that is better than the weights on
        # disk, which only costs a missed future improvement — the
        # opposite order leaves a stale sidecar that lets a worse later
        # epoch destroy the better checkpoint.
        if score_tran is not None and score_tran < best.get(BEST_TRAN, float('inf')):
            best[BEST_TRAN] = score_tran
            self.store_best(best)
            self.save(BEST_TRAN, state, epoch)
        if score_rotate is not None and score_rotate < best.get(BEST_ROTATE, float('inf')):
            best[BEST_ROTATE] = score_rotate
            self.store_best(best)
            self.save(BEST_ROTATE, state, epoch)
        return best
