"""Fused heatmap peak decode as a Pallas TPU kernel.

One VMEM pass per block of heatmaps: argmax (first occurrence, row-major —
parity with np.argmax in the reference get_max_preds, inference.py:35), the
my_taylor log-derivative 5-point stencil (inference.py:75-94) and the
confidence value, emitted together.  The XLA fallback in ops/peak.py lowers
to an argmax reduction plus ten take_along_axis gathers over HBM; here each
heatmap tile is read once into VMEM and everything happens on-chip.

Layout: grid over blocks of 8 heatmaps (TPU sublane granularity); outputs
are written into a (8, 128)-tiled buffer — columns 0/1 hold x/y, column 2
the peak value — because Mosaic requires block shapes aligned to (8, 128)
for f32 VMEM outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8        # heatmaps per program (f32 sublane granularity)
_OUT_LANES = 128  # output row padded to one lane tile


def _kernel(hm_ref, out_ref, *, eps: float, h: int, w: int):
    # All intermediates kept 2-D (sublane x lane): Mosaic's vector layout
    # inference does not handle rank-1 values from multi-axis reductions.
    flat = hm_ref[...].reshape(_BLOCK, h * w)
    mx = jnp.max(flat, axis=1, keepdims=True)                 # (_BLOCK, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, h * w), 1)
    idx = jnp.min(jnp.where(flat == mx, iota, h * w), axis=1,
                  keepdims=True)                              # (_BLOCK, 1)
    pxs = idx % w
    pys = idx // w

    log_flat = jnp.log(jnp.maximum(flat, eps))

    # Stencil values via one-hot masked reductions — branch-free and fully
    # vectorized on the VPU (Mosaic has no dynamic gather from values).
    def at(dy: int, dx: int):
        yy = jnp.clip(pys + dy, 0, h - 1)
        xx = jnp.clip(pxs + dx, 0, w - 1)
        sel = iota == (yy * w + xx)
        return jnp.sum(jnp.where(sel, log_flat, 0.0), axis=1,
                       keepdims=True)                         # (_BLOCK, 1)

    c = at(0, 0)
    hx = 0.5 * (at(0, 1) - at(0, -1))
    hy = 0.5 * (at(1, 0) - at(-1, 0))
    hxx = 0.25 * (at(0, 2) - 2.0 * c + at(0, -2))
    hyy = 0.25 * (at(2, 0) - 2.0 * c + at(-2, 0))

    interior = ((pxs > 1) & (pxs < w - 2) & (pys > 1) & (pys < h - 2))
    nonzero = (hxx != 0.0) & (hyy != 0.0)
    off_x = -hx / jnp.where(hxx == 0.0, 1.0, hxx)
    off_y = -hy / jnp.where(hyy == 0.0, 1.0, hyy)
    in_range = (off_x < 1.0) & (off_y < 1.0)
    apply = interior & nonzero & in_range

    x_out = pxs.astype(jnp.float32) + jnp.where(apply, off_x, 0.0)
    y_out = pys.astype(jnp.float32) + jnp.where(apply, off_y, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _OUT_LANES), 1)
    out = jnp.where(lane == 0, x_out,
                    jnp.where(lane == 1, y_out,
                              jnp.where(lane == 2, mx, 0.0)))
    out_ref[...] = out


@partial(jax.jit, static_argnames=('interpret', 'eps'))
def decode_heatmaps_pallas(heatmaps: jnp.ndarray,
                           interpret: bool | None = None,
                           eps: float = 1e-10
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode. heatmaps: (..., H, W) -> (coords (..., 2), maxvals).

    ``interpret`` defaults to True off-TPU (tests on the CPU backend run
    the kernel in the Pallas interpreter).  ``eps`` is STATIC: it is
    baked into the kernel closure, so a traced value would crash
    pallas_call ('captures constants ... pass them as inputs').
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    batch = heatmaps.shape[:-2]
    h, w = heatmaps.shape[-2:]
    n = 1
    for s in batch:
        n *= s
    n_pad = -(-n // _BLOCK) * _BLOCK
    hm = heatmaps.reshape(n, h, w).astype(jnp.float32)
    if n_pad != n:
        hm = jnp.concatenate(
            [hm, jnp.zeros((n_pad - n, h, w), jnp.float32)], axis=0)

    out = pl.pallas_call(
        partial(_kernel, eps=eps, h=h, w=w),
        grid=(n_pad // _BLOCK,),
        in_specs=[pl.BlockSpec((_BLOCK, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK, _OUT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, _OUT_LANES), jnp.float32),
        interpret=interpret,
    )(hm)
    coords = out[:n, :2].reshape(batch + (2,))
    maxvals = out[:n, 2].reshape(batch)
    return coords, maxvals
