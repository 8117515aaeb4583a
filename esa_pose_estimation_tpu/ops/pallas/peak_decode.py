"""Fused heatmap peak decode as a Pallas TPU kernel.

One VMEM pass per heatmap: argmax (first occurrence, row-major — parity
with np.argmax in the reference get_max_preds, inference.py:35), the
my_taylor log-derivative 5-point stencil (inference.py:75-94) and the
confidence value, emitted together.  The XLA fallback in ops/peak.py lowers
to an argmax reduction plus ten take_along_axis gathers over HBM; here the
heatmap tile is read once into VMEM and everything happens on-chip.

Layout: grid = (B*K,), one program per heatmap; a 128x128 f32 heatmap is
64 KiB — comfortably within the ~16 MiB VMEM budget with double buffering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hm_ref, coords_ref, maxval_ref, *, eps: float):
    hm = hm_ref[0]                                  # (H, W)
    h, w = hm.shape

    mx = jnp.max(hm)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flat = rows * w + cols
    idx = jnp.min(jnp.where(hm == mx, flat, h * w))
    px = idx % w
    py = idx // w

    log_hm = jnp.log(jnp.maximum(hm, eps))

    def at(dy: int, dx: int):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jax.lax.dynamic_slice(log_hm, (yy, xx), (1, 1))[0, 0]

    c = at(0, 0)
    hx = 0.5 * (at(0, 1) - at(0, -1))
    hy = 0.5 * (at(1, 0) - at(-1, 0))
    hxx = 0.25 * (at(0, 2) - 2.0 * c + at(0, -2))
    hyy = 0.25 * (at(2, 0) - 2.0 * c + at(-2, 0))

    interior = ((px > 1) & (px < w - 2) & (py > 1) & (py < h - 2))
    nonzero = (hxx != 0.0) & (hyy != 0.0)
    off_x = -hx / jnp.where(hxx == 0.0, 1.0, hxx)
    off_y = -hy / jnp.where(hyy == 0.0, 1.0, hyy)
    in_range = (off_x < 1.0) & (off_y < 1.0)
    apply = interior & nonzero & in_range

    x_out = px.astype(jnp.float32) + jnp.where(apply, off_x, 0.0)
    y_out = py.astype(jnp.float32) + jnp.where(apply, off_y, 0.0)
    coords_ref[0, 0] = x_out
    coords_ref[0, 1] = y_out
    maxval_ref[0, 0] = mx


@partial(jax.jit, static_argnames=('interpret',))
def decode_heatmaps_pallas(heatmaps: jnp.ndarray,
                           interpret: bool | None = None,
                           eps: float = 1e-10
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode. heatmaps: (..., H, W) -> (coords (..., 2), maxvals).

    ``interpret`` defaults to True off-TPU (tests on the CPU backend run
    the kernel in the Pallas interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    batch = heatmaps.shape[:-2]
    h, w = heatmaps.shape[-2:]
    n = 1
    for s in batch:
        n *= s
    hm = heatmaps.reshape(n, h, w).astype(jnp.float32)

    coords, maxvals = pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(hm)
    return coords.reshape(batch + (2,)), maxvals.reshape(batch)
