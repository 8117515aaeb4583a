"""Quarantined negative-result experiments (measured, rejected, kept).

Everything in this package was implemented as a serving-throughput
hypothesis, proven exact against the production path, MEASURED on a real
TPU v5e chip, and found slower than (or within noise of) the default XLA
program.  The code stays in-tree — with its tests — as documented
evidence (QUALITY.md §3 records the numbers), but it is not production
surface and nothing outside its own tests and opt-in flags imports it:

* :mod:`.cbam_fuse` — fused CBAM gate chain (+ residual tail) as one
  Pallas kernel (~6 HBM passes -> 3).  Wins only at full-lane shapes
  (64x64x256: 1.14x); end-to-end serving moved 3024 -> 3016 img/s
  (noise).  Opt-in via ``models.layers.FUSED_CBAM``.
* :mod:`.merged_fuse` — HRNet fuse-layer ConvBN merging at eval time
  (fold frozen-BN affines, concatenate same-source path kernels into
  full-lane convs).  Exact to 3e-7, measured 3.2% slower (115.5 vs
  111.9 ms per batch-256 forward).  Opt-in via ``models.hrnet.MERGED_FUSE``.
* :mod:`.nhwc_decode` — channels-last peak decode (reduce+gather over
  the sublane axis, no NCHW transpose).  2631 vs 3024 img/s end to end.
  Opt-in via ``ops.peak.NHWC_DECODE``.
"""
