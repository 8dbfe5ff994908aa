"""Pinned numerics envelopes for the Pallas recurrence kernels.

Round 2's r2u2-r2u6 probe chain established that the on-chip divergence
between the 2-layer training-forward kernel and the XLA scan is fp-chaos,
not corruption: layer-0 streams are BITWISE equal, layer-1 diverges only
because its two-dot gate step tiles differently on the MXU, and a
pure-XLA control (split-dot vs concat-dot) diverges identically
(benchmarks/r2u6_tpu.json, docs/KERNELS.md "Numerics").

These constants promote that probe evidence into asserted CI:

* tests/test_kernel_numerics.py — interpret-mode strict equality at
  matmul_precision=highest (catches math bugs on any backend);
* scripts/chip_numerics_gate.py — on-chip gate asserting layer-0 bitwise
  equality and layer-1 divergence within this envelope (catches Mosaic
  lowering regressions that interpret mode cannot see — round 1 proved
  those happen).

Envelope = measured r2u6 rel_final x ~1.5 headroom (same fixed seeds make
the measurement deterministic per compiler version; headroom absorbs
XLA/Mosaic tiling changes).  A REAL kernel bug is shape-independent O(1)
error (r2u6 probe A), which blows through these bounds at every T.
"""

# max |ys_kernel - ys_scan| / max|ys_scan| at T, fixed seeds (r2u6 probe A
# measured: 0.0097 @ 50, 0.0160 @ 100, 0.0258 @ 200, 0.0848 @ 375).
# Chaos values are deterministic per compiled binary but shift with the
# compiler session (the gate's first re-run measured 0.0106/0.0200/0.0474/
# 0.08484 — T375 bit-identical, T200 1.8x): bounds carry ~2.3x headroom
# over the r2u6 anchors, which still sits an order of magnitude below a
# real (shape-independent O(1)) kernel bug.
LSTM2_TRAIN_FWD_REL_ENVELOPE = {
    50: 0.022,
    100: 0.037,
    200: 0.060,
    375: 0.17,
}

# layer-0 streams (g0, h0, c0) must stay BITWISE equal to the scan on chip
# (r2u4): layer 0 is a single-dot gate step, so both paths issue the same
# MXU tiling.  Any nonzero diff here is a kernel bug, never chaos.
LSTM2_LAYER0_BITWISE = 0.0

# production-path gradient self-consistency, GRADIENT-ALIGNED directional
# derivative at eps=3e-3: v = g/|g| gives O(|g|) signal instead of the
# ~1e-5 random-direction projection (r2u6's random-v probe had fd
# dominated by forward chaos for kernel AND XLA control alike — rel ~1.0
# both, benchmarks/r2u6_tpu.json).  Measured on chip 2026-08-17: rel
# 0.028 (benchmarks/r3c_tpu.json v2_dir_gradaligned_eps0.003); bound has
# ~3x headroom.  A wrong gradient fails this at O(1).
GRAD_DIRECTIONAL_REL = 0.08
GRAD_DIRECTIONAL_EPS = 3e-3

# scan-reference gradient check: jax.grad through the kernel path vs
# jax.grad through the pure-XLA scan (no custom_vjp), same loss, short T
# where tiling chaos hasn't amplified.  Unlike the FD check this needs no
# well-conditioned direction — the GRU's gradient at 1/sqrt(h) scale is
# tiny (|g.v| ~1e-3) and the FD quotient at eps=3e-3 is noise-dominated
# at ANY T for that loss, while this direct comparison measured rel
# 1.2e-3 @ T=50 / 2.1e-3 @ T=100 with cosine 1.000000 on chip
# (2026-08-18).  Bound carries ~5x headroom; a wrong backward kernel
# fails at O(1).
SCAN_GRAD_REL = {50: 0.01, 100: 0.015}

# the residual-native (v2) and legacy kernel backward paths must produce
# BITWISE-equal gradients on chip (same gate math, same MXU tilings —
# measured max rel 0.0 for dx and every weight matrix, r3c_tpu.json)
V2_VS_LEGACY_GRAD_REL = 1e-6

# interpret-mode strictness at matmul_precision=highest: no MXU-tiling
# chaos, but the kernel's chunked in-kernel input projection vs the scan's
# hoisted one still reorders fp reductions, and the recurrence amplifies
# that to ~3e-5 by T=375 (measured).  1e-4 sits above that noise and 3-4
# orders below any real math bug (which lands at O(0.1-1)).
INTERPRET_STRICT_ATOL = 1e-4
