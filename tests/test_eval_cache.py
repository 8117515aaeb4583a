"""EvalCache: the decode-once / crop-once / jitted held-out eval path.

The in-train held-out eval re-decoded the FIXED test split and ran the
inference chain eagerly every eval epoch (~0.4 s/img against a 3000
img/s serving bench).  EvalCache stages device-resident crops once and
fuses the tail into one jitted program per batch; these tests pin that
the cached route is numerically identical to the legacy frame route and
that panels/metrics still work.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.cli.train import evaluate
from esa_pose_estimation_tpu.data import synthetic
from esa_pose_estimation_tpu.eval.eval_cache import EvalCache
from esa_pose_estimation_tpu.models import HRNet
from esa_pose_estimation_tpu.utils import config as cfg_mod


def _setup(n=4, crop=32, kp=6):
    model = HRNet(cfg_mod.hrnet_tiny())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 1)), train=False)
    pts = synthetic.spacecraft_points(kp)
    batches = [synthetic.make_batch(jax.random.fold_in(
        jax.random.PRNGKey(5), j), n, pts, crop_size=crop,
        with_frames=True) for j in range(2)]
    return model, variables, pts, batches


class TestEvalCacheParity:
    def test_crops_match_legacy_route_exactly(self):
        """The cache stages EXACTLY the crops the legacy route computes
        (same crop_resize program, same inputs) — this is the wiring
        invariant; everything downstream is the already-tested tail."""
        from esa_pose_estimation_tpu.ops import crop as crop_ops
        model, variables, pts, batches = _setup()
        cache = EvalCache(model, batches, pts, crop_size=32)
        assert cache.n_frames == 8
        for entry, b in zip(cache.batches, batches):
            crops, rates, origins = crop_ops.crop_resize(
                jnp.asarray(b['frame']), jnp.asarray(b['bbox']), 32)
            np.testing.assert_array_equal(np.asarray(entry['crop']),
                                          np.asarray(crops))
            np.testing.assert_array_equal(np.asarray(entry['rate']),
                                          np.asarray(rates))
            np.testing.assert_array_equal(np.asarray(entry['origin']),
                                          np.asarray(origins))
            np.testing.assert_array_equal(entry['quat'],
                                          np.asarray(b['quat']))

    def test_scores_track_legacy_route(self):
        """Cached evaluate ~= legacy evaluate.  Tolerance is loose by
        design: the tail runs as one fused jit instead of eager
        op-by-op, and on a RANDOM-weights net the solver amplifies
        fusion-level float noise through discrete RANSAC decisions (a
        trained net's scores agree to ~1e-4 — the dress-rehearsal
        chain pins that end to end).  A wiring bug (wrong crops, keys,
        batch pairing) shifts these junk scores by O(1)."""
        model, variables, pts, batches = _setup()
        key = jax.random.PRNGKey(9)
        legacy = evaluate(model, variables, batches, pts, key, crop_size=32)
        cache = EvalCache(model, batches, pts, crop_size=32)
        cached = evaluate(model, variables, cache, pts, key, crop_size=32)
        assert cached['nonfinite'] == legacy['nonfinite']
        for k in ('score_t', 'score_r', 'pix_err'):
            np.testing.assert_allclose(cached[k], legacy[k], rtol=0.05,
                                       err_msg=k)

    def test_repeat_eval_reuses_cache(self):
        model, variables, pts, batches = _setup(n=2)
        cache = EvalCache(model, batches, pts, crop_size=32)
        r1 = evaluate(model, variables, cache, pts, jax.random.PRNGKey(1),
                      crop_size=32)
        r2 = evaluate(model, variables, cache, pts, jax.random.PRNGKey(1),
                      crop_size=32)
        assert r1['speed'] == r2['speed']
        assert 'decode_s' in cache.timing and 'crop_stage_s' in cache.timing

    def test_panels_from_cache(self, tmp_path):
        model, variables, pts, batches = _setup(n=3)
        cache = EvalCache(model, batches, pts, crop_size=32, n_panels=2)
        pdir = str(tmp_path / 'panels')
        result = evaluate(model, variables, cache, pts,
                          jax.random.PRNGKey(2), crop_size=32,
                          panel_dir=pdir, n_panels=2)
        assert result['panel_dir'] == pdir
        assert sorted(os.listdir(pdir)) == ['frame00.png', 'frame01.png']
