"""Fused training-path Pallas kernels: the dilated-causal conv stack as a
chain of layer-group kernels with a custom VJP.

This is the BASELINE-mandated fused training kernel ("Pallas kernels fuse the
dilated causal conv + gating + residual/skip path").  Why fusion wins: the
XLA scan path round-trips x, z, h, and the f32 skip accumulator through HBM
for every layer (~60 MB/layer on the small preset); these kernels walk the
sequence once per LAYER GROUP, keeping the group's layer pipeline
VMEM-resident:

  * layers are split into contiguous groups sized so each kernel's weights,
    rings, and (backward) f32 weight-grad blocks fit VMEM — small models are
    a single group; the `full` preset (L=40, R=128) runs as five groups;
  * grid (B, T/TT) walks time tiles left-to-right; per-layer causal left
    context lives in a compact VMEM ring carried across tiles (the decode
    kernel's ring structure at tile granularity);
  * the skip-sum accumulates ACROSS group calls through an aliased
    input/output (one [B, T, S] f32 buffer, never duplicated);
  * backward = "ring-snapshot rematerialization": each forward group stores
    its per-tile ring state; each backward group walks tiles right-to-left,
    recomputes its layers from the snapshot + the group-input stash,
    accumulates f32 weight grads in constant-index VMEM output blocks, and
    chains the residual cotangent dx to the group below.  The transposed
    causal shift rides a dz ring from later to earlier tiles.

Numerics: f32 residual carry and gate math, bf16 at MXU inputs and ring/stash
stores, f32 gradient flow end-to-end (docs/ARCHITECTURE.md §3 — matches what
XLA's excess-precision compilation effectively executes for the scan path).
Two hardware lessons encoded here: Mosaic requires 32-bit matmul
accumulators, and it MISCOMPILES vector concat+slice at non-sublane-aligned
boundaries — every causal shift goes through scratch window buffers with
static ref stores/loads instead.

Equivalence is tested against a pure-jnp oracle of the exact same recipe
(tests/test_pallas_train.py) in interpret mode; hardware output was verified
bit-exact against interpret mode on a v5e.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.config import WaveNetConfig

VMEM_BUDGET = 13 * 1024 * 1024


def multirow_compiler_options(nb) -> dict:
    """Compiler options needed to compile an EXPLICIT nb > 1 kernel variant
    for hardware (jax.jit(..., compiler_options=...) or
    .lower().compile(compiler_options=...)).

    The multi-row stacks exceed the compiler's default 16 MiB scoped-VMEM
    stack limit, roughly in proportion to rows per grid step (measured
    2026-08-18 on `small`: nf=2 needs 17.4 MiB, nf=4 needs 34.1 MiB), so
    scale the limit with max(nb).  Auto-pick never selects nb > 1 (see
    pick_nb_dils), so ordinary jits never need this."""
    if max(nb) <= 1:
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib": 16 * 1024 * int(max(nb))}


# Hardware-verified upper bound on rows per multi-row grid step.  At
# nb=(8, 1) the FORWARD kernel miscompiles on v5e (Mosaic): hardware output
# diverges wholesale from interpret mode (max diff 1.88 over ~100% of
# elements, `small` B=8 W=2048, 2026-08-18, tools/tpu_verify.py), while
# interpret mode at the same nb is bit-exact — i.e. the kernel math is
# right and the lowering is wrong, the fourth such Mosaic bug (see
# docs/ARCHITECTURE.md §3).  nb in {1,2,4} is bit-exact on hardware.  Since
# multi-row is a measured perf LOSS anyway (pick_nb ships (1,1)), the
# planner refuses nb > 4 rather than working around the miscompile.
NB_HW_MAX = 4


def _pad8(d: int) -> int:
    return (d + 7) // 8 * 8


def _winpad(cfg: WaveNetConfig) -> int:
    """Rows reserved for left context in the scratch window buffers.

    max(8, max_dilation): every layer's padded ring region (_pad8(d)) must
    fit, including configs whose max_dilation < 8 — with the raw
    max_dilation, _pad8(d) would exceed the reserved region and the ring
    store would slice negatively (found by the round-1 advisor).  The roll
    arithmetic is independent of the pad size: for a window of
    (pad + TT) rows the causal shift by d is roll(TT + d) and the
    transposed shift is roll(TT + pad - d)."""
    return max(8, cfg.max_dilation)


def _ring_layout(dils):
    """Padded ring layout: each layer's ring region is round_up(d, 8) rows
    holding the last pad samples of that layer's input.  Every ring STORE is
    then 8-row aligned — Mosaic miscompiles stores at misaligned sublane
    offsets (loads at misaligned offsets are fine)."""
    offs, acc = [], 0
    for d in dils:
        offs.append(acc)
        acc += _pad8(d)
    return tuple(offs), acc


def pick_tile(cfg: WaveNetConfig, T: int) -> int:
    """Largest power-of-two tile >= max(max_dilation, 8) that divides T,
    capped.  The floor of 8 keeps the ring-store source slice
    xbuf[pad + TT - pad8 : ...] sublane-aligned for small-dilation configs."""
    lo = max(cfg.max_dilation, 8)
    tt = max(lo, 512)
    while tt > lo and T % tt:
        tt //= 2
    if T % tt or tt < lo:
        return 0
    return tt


def _group_sizes(cfg: WaveNetConfig, TT: int, dils, nb=(1, 1)):
    """VMEM bytes (fwd, bwd) for one layer-group kernel processing
    nb = (rows per fwd grid step, rows per bwd grid step).

    Per-row terms (I/O blocks, rings, stashes) scale with nb; the shared
    scratch windows and weight blocks do not.  The `(nb-1) * vals` terms
    approximate the flattened [nb*TT, *] live VALUES (x/skip carries, z, h,
    o, dz, ...) the multi-row kernel keeps in flight — calibrated so nb=1
    reproduces the round-2 formula exactly (whose plans are
    hardware-proven), and nb>1 is strictly more conservative."""
    R, S = cfg.residual_channels, cfg.skip_channels
    Lg = len(dils)
    sum_dg = sum(_pad8(d) for d in dils)
    maxd = _winpad(cfg)
    M = cfg.mel.num_mels if cfg.mel is not None else 0
    gc = 8 * Lg * R if cfg.global_classes is not None else 0   # g block f32
    nf, nbw = nb
    w = 2 * Lg * (4 * R * R + R * R + R * S) + 2 * Lg * M * 2 * R
    dw = (4 * Lg * (4 * R * R + R * R + R * S + 3 * R)
          + 4 * Lg * M * 2 * R)
    # xbuf scratch is f32 (4 bytes); y input blocks are bf16 double-buffered
    fwd = (w + nf * gc + 2 * nf * sum_dg * R + 4 * (maxd + TT) * R
           + 4 * nf * TT * M
           + 2 * nf * (2 * TT * R * 2 + 4 * TT * S * 2 + 2 * sum_dg * R
                       + 2 * TT * R)
           + (nf - 1) * TT * (13 * R + 4 * S + M))
    bwd = (w + dw + nbw * (8 * TT * M + 2 * gc)
           + 2 * nbw * (Lg + 1) * TT * R
           + 4 * nbw * sum_dg * R + 4 * (maxd + TT) * R + 4 * (TT + maxd) * R
           + 2 * nbw * (2 * TT * R * 2 + 4 * TT * R * 4 + 4 * TT * S
                        + 2 * sum_dg * R)
           + (nbw - 1) * TT * (20 * R + 4 * S + 2 * M))
    return fwd, bwd


def plan_dils(cfg: WaveNetConfig, dils, TT: int,
              nb=(1, 1), hw: bool = True) -> List[Tuple[int, int]]:
    """Fewest contiguous layer groups (within the given dilation slice)
    whose fwd AND bwd kernels fit VMEM.  With hw=True (default) returns []
    (no plan) for nb rows beyond NB_HW_MAX — those variants miscompile on
    hardware.  hw=False (interpret mode, which is bit-exact at any nb)
    lifts the fence so tests and a future-chip recalibration past
    NB_HW_MAX stay runnable (round-2 advisor).

    Mel-conditioned multi-row is additionally refused on hardware: the
    (NB>1, y-stream) forward miscompiles on v5e whenever the grid has more
    than one batch block (bisected 2026-08-19: nb=(2,1) B=4 diverges at
    median elem rel 0.19 on BOTH backend-pool instances while interpret is
    bit-exact and nb=(4,1) B=4 — a single batch block — passes; the fifth
    Mosaic miscompile, docs/ARCHITECTURE.md §3).  Multi-row is a measured
    perf loss anyway (pick_nb), so the fence costs nothing."""
    if hw and max(nb) > NB_HW_MAX:
        return []
    if hw and cfg.mel is not None and max(nb) > 1:
        return []
    L = len(dils)
    groups, lo = [], 0
    while lo < L:
        hi = lo + 1
        if max(_group_sizes(cfg, TT, dils[lo:hi], nb)) > VMEM_BUDGET:
            return []                                   # cannot fit at all
        while hi < L and max(_group_sizes(cfg, TT, dils[lo:hi + 1],
                                          nb)) <= VMEM_BUDGET:
            hi += 1
        groups.append((lo, hi))
        lo = hi
    return groups


def group_plan(cfg: WaveNetConfig, TT: int,
               nb=(1, 1)) -> List[Tuple[int, int]]:
    return plan_dils(cfg, cfg.dilations, TT, nb)


def _pow2_divisors(B: int, cap: int = NB_HW_MAX) -> List[int]:
    out, n = [], 1
    while n <= min(B, cap):
        if B % n == 0:
            out.append(n)
        n *= 2
    return out


def pick_nb(cfg: WaveNetConfig, T: int, B: int,
            TT: int = 0) -> Tuple[int, int]:
    """Choose (rows per fwd grid step, rows per bwd grid step).

    Measured verdict (see pick_nb_dils): (1, 1) — row fusion does not beat
    the single-row layout on v5e, so auto-pick returns the hardware-proven
    layout; WAVENET_TPU_NB=nf,nbw forces an explicit multi-row variant
    (compile it with multirow_compiler_options(nb)).  The analytic cost
    model that once scored nb_candidates is deleted (round-2 verdict:
    unused, never validated — the sweep tool measures instead of
    estimating)."""
    return pick_nb_dils(cfg, cfg.dilations, T, B, TT)


def nb_candidates(cfg: WaveNetConfig, dils, TT: int, B: int):
    """VMEM-feasible multi-row candidates: [((nb_fwd, nb_bwd), ngroups)].
    The single source of the candidate space — pick_nb_dils scores exactly
    this list and tools/tpu_multirow_bench.py sweeps exactly this list."""
    out = []
    for nf in _pow2_divisors(B):
        for nbw in _pow2_divisors(B):
            groups = plan_dils(cfg, dils, TT, (nf, nbw))
            if groups:
                out.append(((nf, nbw), len(groups)))
    return out


def pick_nb_dils(cfg: WaveNetConfig, dils, T: int, B: int,
                 TT: int = 0) -> Tuple[int, int]:
    """pick_nb over an arbitrary dilation slice (a pipeline stage's layers);
    B is the batch the kernels actually see (a microbatch under pipeline
    parallelism, the per-shard batch under dp shard_map).

    Returns (1, 1) unless WAVENET_TPU_NB=nf,nbw forces a layout.  The
    multi-row kernels are mathematically identical and fully tested, but a
    v5e hardware sweep (2026-08-18, `small` B=8 W=8192, quiet window,
    value_and_grad of the fused loss) measured NO win: (1,1) 10.07 ms/step
    vs (2,1) 10.43 / (1,2) 10.50 / (2,2) 11.36 / (4,4) 10.14 — the
    serialized-chain latency _est_cost_us models does not shorten with row
    fusion in practice, and nb > 1 additionally needs
    multirow_compiler_options(nb) to compile at all (scoped-VMEM stack exceeds
    the default 16 MiB limit).  So auto-pick ships the layout the hardware
    actually favors; the candidate space, cost model, and
    tools/tpu_multirow_bench.py remain for recalibration on future chips."""
    import os
    forced = os.environ.get("WAVENET_TPU_NB")
    if forced:
        nf, nbw = (int(v) for v in forced.split(","))
        return (nf, nbw)
    return (1, 1)


def supported(cfg: WaveNetConfig, T: int) -> bool:
    if cfg.kernel_size != 2:          # fused kernels are width-2; wider
        return False                  # kernels train on the XLA scan
    TT = pick_tile(cfg, T)
    return bool(TT) and bool(group_plan(cfg, TT))


def _causal_shift(x_b, ring_region, d, pad, TT, maxd, xbuf):
    """xp[t] = (ring | x_b)[t - d]: THE Mosaic-safe causal shift, used by
    the forward kernel and both backward passes (ring_region is the layer's
    [pad, R] left context — the live ring or a ring snapshot; pad==_pad8(d)).

    Two recipes by dilation:
      d >= 8 (pad == d): every boundary is 8-row aligned, so the shift is a
        plain aligned concat of the ring region and x_b[:TT-d] — no scratch
        buffer, no roll, no f32 round-trip.
      d < 8: boundaries are misaligned, and Mosaic miscompiles BOTH
        misaligned vector slices and misaligned ref loads of nonzero data
        (three hardware-vs-interpret bisects) — go through the aligned
        scratch window + pltpu.roll.  The buffer is f32 because
        tpu.dynamic_rotate only handles 32-bit lanes; values are
        bf16-representable so the round-trip is exact."""
    if d >= 8:
        return (ring_region if d == TT else
                jnp.concatenate([ring_region, x_b[:TT - d]], axis=0))
    xbuf[maxd:] = x_b.astype(jnp.float32)
    xbuf[maxd - pad:maxd] = ring_region.astype(jnp.float32)
    return pltpu.roll(xbuf[maxd - pad:maxd + TT],
                      (TT + d) % (pad + TT), 0)[:TT].astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# forward kernel for one layer group
# ---------------------------------------------------------------------------

def _rows(ref, NB: int):
    """Concatenate a block's NB batch rows into one flat [NB*TT, C] value.
    NB == 1 keeps the round-2 single-row load (hardware-proven codegen)."""
    if NB == 1:
        return ref[0]
    return jnp.concatenate([ref[n] for n in range(NB)], axis=0)


def _store_rows(ref, NB: int, TT: int, val):
    if NB == 1:
        ref[0] = val
    else:
        for n in range(NB):
            ref[n] = val[n * TT:(n + 1) * TT]



def _round_bf16(v, interpret: bool):
    """Round an f32 value to its nearest-bf16 value, STAYING f32.

    Hardware Mosaic lowers the astype bf16->f32 pair faithfully (verified:
    kernel outputs are 100% bf16-representable); the INTERPRET path runs the
    same expression through XLA, whose simplifier folds convert(convert(x))
    to identity — the unrounded stream made every multi-group forward
    diverge hw-vs-interpret (bisected 2026-08-19, hw correct).  XLA
    preserves reduce_precision, but Mosaic has no lowering for it, hence
    the branch."""
    if interpret:
        return jax.lax.reduce_precision(v, 8, 7)
    return v.astype(jnp.bfloat16).astype(jnp.float32)

def _fwd_kernel(cfg: WaveNetConfig, TT: int, dils, has_cond: bool,
                has_gc: bool, NB: int, interpret: bool, *refs):
    refs = list(refs)
    xin_ref, skip_in_ref = refs[:2]
    refs = refs[2:]
    y_ref = refs.pop(0) if has_cond else None
    g_ref = refs.pop(0) if has_gc else None      # [NB, Lg, 2R] f32 gate offset
    if has_cond:
        (wz_ref, b_ref, wrs_ref, bres_ref, bskip_ref, vcond_ref,
         skip_ref, snaps_ref, xout_ref, rings, xbuf) = refs
    else:
        (wz_ref, b_ref, wrs_ref, bres_ref, bskip_ref,
         skip_ref, snaps_ref, xout_ref, rings, xbuf) = refs
        vcond_ref = None
    R = cfg.residual_channels
    offs, _ = _ring_layout(dils)                 # group-local padded offsets
    j = pl.program_id(1)
    maxd = _winpad(cfg)

    @pl.when(j == 0)
    def _():
        rings[:] = jnp.zeros_like(rings)

    if NB == 1:
        snaps_ref[0, 0] = rings[:]               # ring state at tile START
    else:
        snaps_ref[:, 0] = rings[:]

    # f32 residual carry; bf16 only at MXU inputs / ring+stash stores.  The
    # group I/O stream (xin/xout) is f32 ARRAYS holding bf16-ROUNDED values:
    # primal numerics are identical to a bf16 stream, but autodiff cotangents
    # across group boundaries keep f32 (bf16 grads measurably degraded
    # convergence in round 1).
    #
    # Multi-row (NB > 1): the block's NB batch rows are flattened to
    # [NB*TT, C] so every matmul carries NB tiles of M — identical math
    # (rows are independent in a matmul), NB-fold fewer serialized grid
    # steps.  Only the causal shifts and ring updates stay per-row (each row
    # has its own left-context ring).
    x = _rows(xin_ref, NB)                       # [NB*TT, R] f32 (bf16-valued)
    skip = _rows(skip_in_ref, NB)
    y = _rows(y_ref, NB) if has_cond else None   # [NB*TT, M] bf16

    for li, (d, off) in enumerate(zip(dils, offs)):
        pad = _pad8(d)
        x_b = x.astype(jnp.bfloat16)
        xps = []
        for n in range(NB):
            xbn = x_b if NB == 1 else x_b[n * TT:(n + 1) * TT]
            rr = rings[off:off + pad] if NB == 1 else rings[n, off:off + pad]
            xps.append(_causal_shift(xbn, rr, d, pad, TT, maxd, xbuf))
            # ring update: the last pad rows of this tile become the next
            # tile's left context.  d >= 8 stores straight from x_b; d < 8
            # reads back from the scratch window (same values, already
            # staged there — so it must happen inside this row's iteration,
            # before the next row overwrites xbuf)
            if d >= 8:
                if NB == 1:
                    rings[off:off + d] = xbn[TT - d:]
                else:
                    rings[n, off:off + d] = xbn[TT - d:]
            else:
                rv = xbuf[maxd + TT - pad:maxd + TT].astype(jnp.bfloat16)
                if NB == 1:
                    rings[off:off + pad] = rv
                else:
                    rings[n, off:off + pad] = rv
        xp = xps[0] if NB == 1 else jnp.concatenate(xps, axis=0)
        # MXU K-fusion: one [NB*TT, 2R] @ [2R, 2R] matmul instead of two
        # K=R halves — doubles MXU K-occupancy for R < 128 configs (the
        # lane-axis concat/slice patterns are hw-vs-interpret verified by
        # tools/tpu_lane_ops_check.py)
        xcat = jnp.concatenate([x_b, xp], axis=1)          # [NB*TT, 2R]
        z = (jnp.dot(xcat, wz_ref[li], preferred_element_type=jnp.float32)
             + b_ref[li])                        # [NB*TT, 2R] f32
        if has_cond:                             # paper eq.3: V*y into gate
            z = z + jnp.dot(y, vcond_ref[li],
                            preferred_element_type=jnp.float32)
        if has_gc:                               # paper eq.2: global offset
            if NB == 1:
                z = z + g_ref[0, li:li + 1, :]   # [1, 2R] broadcast over TT
            else:
                z = z + jnp.concatenate(
                    [jnp.broadcast_to(g_ref[n, li:li + 1, :], (TT, 2 * R))
                     for n in range(NB)], axis=0)
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        # MXU N-fusion: res and skip projections as one [NB*TT,R] @ [R, R+S]
        o = jnp.dot(h, wrs_ref[li], preferred_element_type=jnp.float32)
        x = x + o[:, :R] + bres_ref[li]
        skip = skip + o[:, R:] + bskip_ref[li]

    _store_rows(skip_ref, NB, TT, skip)
    # bf16-rounded group stream: see _round_bf16 (interpret needs
    # reduce_precision or XLA folds the rounding away entirely)
    _store_rows(xout_ref, NB, TT, _round_bf16(x, interpret))


# ---------------------------------------------------------------------------
# backward kernel for one layer group (tiles right-to-left)
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: WaveNetConfig, TT: int, nT: int, dils,
                has_cond: bool, has_gc: bool, NB: int, interpret: bool,
                *refs):
    """Backward over one layer group.  xin is the stashed group input;
    dxin is the cotangent of the group's x OUTPUT."""
    refs = list(refs)
    xin_ref, snaps_ref, dskip_ref, dxin_ref = refs[:4]
    refs = refs[4:]
    y_ref = refs.pop(0) if has_cond else None
    g_ref = refs.pop(0) if has_gc else None      # [NB, Lg, 2R] f32
    wz_ref, b_ref, wrs_ref, bres_ref = refs[:4]
    refs = refs[4:]
    vcond_ref = refs.pop(0) if has_cond else None
    dx_ref, dwz_ref, db_ref, dwrs_ref, dbres_ref = refs[:5]
    refs = refs[5:]
    if has_cond:
        dvcond_ref, dy_ref = refs[:2]
        refs = refs[2:]
    else:
        dvcond_ref = dy_ref = None
    dg_ref = refs.pop(0) if has_gc else None     # [NB, Lg, 2R] f32 per-row
    xs, dz_rings, xbuf, dbuf = refs
    R = cfg.residual_channels
    offs, _ = _ring_layout(dils)                 # group-local padded offsets
    Lg = len(dils)
    bi = pl.program_id(0)
    jr = pl.program_id(1)                        # 0 .. nT-1, tile = nT-1-jr
    maxd = _winpad(cfg)

    def snap_region(n, off, pad):
        if NB == 1:
            return snaps_ref[0, 0, off:off + pad]
        return snaps_ref[n, 0, off:off + pad]

    def _dg(a, b, ca, cb, prec=jnp.float32):
        return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                   preferred_element_type=prec)

    @pl.when(jnp.logical_and(bi == 0, jr == 0))
    def _():
        zrefs = [dwz_ref, db_ref, dwrs_ref, dbres_ref]
        if has_cond:
            zrefs.append(dvcond_ref)
        for ref in zrefs:
            ref[:] = jnp.zeros_like(ref)

    @pl.when(jr == 0)                            # new batch row: clear dz ring
    def _():
        dz_rings[:] = jnp.zeros_like(dz_rings)
        if has_gc:                               # per-row dg accumulator
            dg_ref[:] = jnp.zeros_like(dg_ref)

    def gate_offset(li):
        if NB == 1:
            return g_ref[0, li:li + 1, :]
        return jnp.concatenate(
            [jnp.broadcast_to(g_ref[n, li:li + 1, :], (TT, 2 * R))
             for n in range(NB)], axis=0)

    # ---- recompute this tile's group-layer inputs from ring snapshots ----
    x = _rows(xin_ref, NB)                       # f32 (bf16-valued) stash
    y_flat = _rows(y_ref, NB) if has_cond else None
    xs[0] = x.astype(jnp.bfloat16)
    for li, (d, off) in enumerate(zip(dils, offs)):
        pad = _pad8(d)
        x_b = x.astype(jnp.bfloat16)
        xps = []
        for n in range(NB):
            xbn = x_b if NB == 1 else x_b[n * TT:(n + 1) * TT]
            xps.append(_causal_shift(xbn, snap_region(n, off, pad), d, pad,
                                     TT, maxd, xbuf))
        xp = xps[0] if NB == 1 else jnp.concatenate(xps, axis=0)
        z = (jnp.dot(jnp.concatenate([x_b, xp], axis=1), wz_ref[li],
                     preferred_element_type=jnp.float32)
             + b_ref[li])
        if has_cond:
            z = z + jnp.dot(y_flat, vcond_ref[li],
                            preferred_element_type=jnp.float32)
        if has_gc:
            z = z + gate_offset(li)
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        o = jnp.dot(h, wrs_ref[li], preferred_element_type=jnp.float32)
        x = x + o[:, :R] + bres_ref[li]
        xs[li + 1] = x.astype(jnp.bfloat16)

    # ---- reverse pass: GRADIENTS STAY f32 END-TO-END (quantizing them to
    # bf16 measurably degraded convergence); forward residuals (h, x) are
    # bf16, cast up exactly for the f32 MXU dots ----
    dskip = _rows(dskip_ref, NB)                 # [NB*TT, S] f32
    dx = _rows(dxin_ref, NB)                     # [NB*TT, R] f32 (d x_{hi})
    if has_cond:
        y_f = y_flat.astype(jnp.float32)         # [NB*TT, M]
        dy = jnp.zeros_like(y_f)

    for li in reversed(range(Lg)):
        d, off = dils[li], offs[li]
        pad = _pad8(d)
        x_lb16 = xs[li]                          # bf16, as the fwd consumed
        xpls = []
        for n in range(NB):
            xln = x_lb16 if NB == 1 else x_lb16[n * TT:(n + 1) * TT]
            xpls.append(_causal_shift(xln, snap_region(n, off, pad), d, pad,
                                      TT, maxd, xbuf))
        xp_l = xpls[0] if NB == 1 else jnp.concatenate(xpls, axis=0)
        xcat = jnp.concatenate([x_lb16, xp_l], axis=1)    # [NB*TT, 2R] bf16
        z = (jnp.dot(xcat, wz_ref[li], preferred_element_type=jnp.float32)
             + b_ref[li])
        if has_cond:
            z = z + jnp.dot(y_flat, vcond_ref[li],
                            preferred_element_type=jnp.float32)
        if has_gc:
            z = z + gate_offset(li)
        tf = jnp.tanh(z[:, :R])
        sg = jax.nn.sigmoid(z[:, R:])
        h = _round_bf16(tf * sg, interpret)   # match the fwd's bf16 h

        dbres_ref[li:li + 1, :] += jnp.sum(dx, axis=0, keepdims=True)
        # fused res/skip cotangent: contract [dx | dskip] against w_rs in
        # one K=(R+S) matmul; the weight-grad pair is one [R, R+S] product
        dcat = jnp.concatenate([dx, dskip], axis=1)          # [TT, R+S] f32
        dh = _dg(dcat, wrs_ref[li].astype(jnp.float32), 1, 1)
        dwrs_ref[li] += _dg(h, dcat, 0, 0)                   # h^T @ [dx|dskip]

        dzf = dh * sg * (1.0 - tf * tf)
        dzg = dh * tf * sg * (1.0 - sg)
        dz = jnp.concatenate([dzf, dzg], axis=1)     # [TT, 2R] f32

        dwz_ref[li] += _dg(xcat.astype(jnp.float32), dz, 0, 0)  # [2R, 2R]
        db_ref[li:li + 1, :] += jnp.sum(dz, axis=0, keepdims=True)
        if has_gc:                               # dg[b, l] = sum_t dz
            if NB == 1:
                dg_ref[0, li:li + 1, :] += jnp.sum(dz, axis=0, keepdims=True)
            else:
                for n in range(NB):
                    dg_ref[n, li:li + 1, :] += jnp.sum(
                        dz[n * TT:(n + 1) * TT], axis=0, keepdims=True)
        if has_cond:
            dvcond_ref[li] += _dg(y_f, dz, 0, 0)          # y^T @ dz
            dy = dy + _dg(dz, vcond_ref[li].astype(jnp.float32), 1, 1)

        # fused input cotangent: dz @ wz^T gives [d x_cur | d x_prev]
        dboth = _dg(dz, wz_ref[li].astype(jnp.float32), 1, 1)  # [NB*TT, 2R]
        dprev = dboth[:, R:]
        # transposed causal shift, per batch row: dx[s] += dprev[s+d]; rows
        # s >= TT-d come from the LATER tile's dprev head (that row's dz
        # ring).  Aligned concat for d >= 8 (read the ring region BEFORE
        # overwriting it), scratch roll for d < 8 — same two recipes as the
        # forward shift.  dbuf is shared: each row's shifted value is
        # materialized before the next row restages dbuf.
        shifted_rows = []
        for n in range(NB):
            dprev_n = dprev if NB == 1 else dprev[n * TT:(n + 1) * TT]
            if d >= 8:
                # dprev is a LANE-slice of the matmul output (offset R):
                # Mosaic rejects concat operands whose layouts disagree in
                # lane offset ("result/input offset mismatch on non-concat
                # dimension", found by the FS bisect) — a store/load through
                # dbuf renormalizes it.
                dbuf[:TT] = dprev_n
                ring_rows = (dz_rings[off:off + d] if NB == 1 else
                             dz_rings[n, off:off + d])      # [d, R] f32
                shifted_rows.append(
                    ring_rows if d == TT else
                    jnp.concatenate([dbuf[d:TT], ring_rows], axis=0))
                if NB == 1:
                    dz_rings[off:off + d] = dbuf[:d]
                else:
                    dz_rings[n, off:off + d] = dbuf[:d]
            else:
                dbuf[:TT] = dprev_n
                dbuf[TT:TT + pad] = (dz_rings[off:off + pad] if NB == 1 else
                                     dz_rings[n, off:off + pad])
                shifted_rows.append(
                    pltpu.roll(dbuf[:TT + pad], TT + pad - d, 0)[:TT])
                # head of dprev, aligned
                if NB == 1:
                    dz_rings[off:off + pad] = dbuf[:pad]
                else:
                    dz_rings[n, off:off + pad] = dbuf[:pad]
        shifted = (shifted_rows[0] if NB == 1 else
                   jnp.concatenate(shifted_rows, axis=0))

        dx = dx + dboth[:, :R] + shifted

    _store_rows(dx_ref, NB, TT, dx)
    if has_cond:
        _store_rows(dy_ref, NB, TT, dy)


# ---------------------------------------------------------------------------
# per-group op with custom VJP
#
# Each layer GROUP is one differentiable op; a stack is a plain Python chain
# of group_apply calls, and JAX autodiff composes the backward across groups
# (and across whatever else wraps them — notably the pipeline shard_map in
# parallel/pipeline.py, whose ppermute/scan transpose for free).  The group's
# static identity is its dilation tuple, NOT its absolute layer index: every
# pipeline stage then traces the identical program (SPMD) because stages
# partition whole dilation blocks.
# ---------------------------------------------------------------------------

GROUP_KEYS = ("w_cur", "w_prev", "b", "w_res", "b_res", "w_skip", "b_skip")


def _slice_group(params, lo, hi, has_cond):
    gw = {k: params[k][lo:hi] for k in GROUP_KEYS}
    if has_cond:
        gw["v_cond"] = params["v_cond"][lo:hi]
    return gw


def _prep_weights(cfg, gw):
    """Per-group kernel operands with the MXU K/N-fusion layouts:
      wz  [Lg, 2R, 2R] = [w_cur ; w_prev] stacked on the contraction dim
      wrs [Lg, R, R+S] = [w_res | w_skip] side by side on the output dim
    One z matmul at K=2R and one res/skip matmul at N=R+S per layer — full
    128-wide MXU tiles for the R=64 presets (round-1 MFU was ~12% on
    `small` precisely because K=N=64 left the MXU half-empty)."""
    R = cfg.residual_channels
    Lg = gw["w_cur"].shape[0]
    bf = jnp.bfloat16
    return (
        jnp.concatenate([gw["w_cur"].reshape(Lg, R, 2 * R),
                         gw["w_prev"].reshape(Lg, R, 2 * R)],
                        axis=1).astype(bf),
        gw["b"].reshape(Lg, 1, 2 * R).astype(jnp.float32),
        jnp.concatenate([gw["w_res"], gw["w_skip"]], axis=2).astype(bf),
        gw["b_res"].reshape(Lg, 1, R).astype(jnp.float32),
        gw["b_skip"].reshape(Lg, 1, -1).astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def group_apply(cfg: WaveNetConfig, interpret: bool, TT: int, dils, nb,
                x, skip_in, gw, y, g=None):
    """One layer group: (x [B,T,R] f32 bf16-valued, skip_in [B,T,S] f32)
    -> (skip_out, x_out).  gw: dict of raw per-group param slices; y: [B,T,M]
    upsampled conditioning features or None; g: [B, Lg, 2R] f32 time-constant
    global-conditioning gate offsets or None; dils: static dilation tuple;
    nb: static (fwd, bwd) batch rows per grid step (see pick_nb)."""
    skip, x_out, _ = _group_fwd(cfg, interpret, TT, dils, nb, x, skip_in, gw,
                                y, g)
    return skip, x_out


def _group_fwd(cfg, interpret, TT, dils, nb, x, skip_in, gw, y, g):
    B, T, R = x.shape
    nT = T // TT
    NB = nb[0]
    if B % NB:
        raise ValueError(f"nb_fwd={NB} does not divide batch {B}")
    S = cfg.skip_channels
    has_cond = y is not None
    has_gc = g is not None
    _, sum_dg = _ring_layout(dils)
    ops = _prep_weights(cfg, gw)
    kernel = functools.partial(_fwd_kernel, cfg, TT, dils, has_cond, has_gc,
                               NB, interpret)

    blk = lambda bi, j: (bi, j, 0)
    in_specs = [
        pl.BlockSpec((NB, TT, R), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, TT, S), blk, memory_space=pltpu.VMEM),
    ]
    operands = [x, skip_in]
    if has_cond:
        in_specs.append(pl.BlockSpec((NB, TT, cfg.mel.num_mels), blk,
                                     memory_space=pltpu.VMEM))
        operands.append(y.astype(jnp.bfloat16))
    if has_gc:
        in_specs.append(pl.BlockSpec((NB, len(dils), 2 * R),
                                     lambda bi, j: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(g)
    in_specs += [pl.BlockSpec(o.shape, (lambda bi, j, nd=o.ndim: (0,) * nd),
                              memory_space=pltpu.VMEM) for o in ops]
    operands += list(ops)
    if has_cond:
        M = cfg.mel.num_mels
        vc = gw["v_cond"].reshape(len(dils), M, 2 * R).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec(vc.shape, lambda bi, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(vc)

    ring_shape = ((sum_dg, R) if NB == 1 else (NB, sum_dg, R))
    skip, snaps, x_out = pl.pallas_call(
        kernel,
        grid=(B // NB, nT),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NB, TT, S), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1, sum_dg, R), lambda bi, j: (bi, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, TT, R), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((B, nT, sum_dg, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, T, R), jnp.float32),
        ),
        input_output_aliases={1: 0},              # skip accumulator
        scratch_shapes=[
            pltpu.VMEM(ring_shape, jnp.bfloat16),
            pltpu.VMEM((_winpad(cfg) + TT, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return skip, x_out, snaps


def _group_vjp_fwd(cfg, interpret, TT, dils, nb, x, skip_in, gw, y, g=None):
    skip, x_out, snaps = _group_fwd(cfg, interpret, TT, dils, nb, x, skip_in,
                                    gw, y, g)
    return (skip, x_out), (x, snaps, gw, y, g)


def _group_vjp_bwd(cfg, interpret, TT, dils, nb, res, cts):
    dskip, dxout = cts
    x, snaps, gw, y, g = res
    B, T, R = x.shape
    nT = T // TT
    NB = nb[1]
    if B % NB:
        raise ValueError(f"nb_bwd={NB} does not divide batch {B}")
    S = cfg.skip_channels
    Lg = len(dils)
    has_cond = y is not None
    has_gc = g is not None
    _, sum_dg = _ring_layout(dils)
    wz, b, wrs, bres, _ = _prep_weights(cfg, gw)
    kernel = functools.partial(_bwd_kernel, cfg, TT, nT, dils, has_cond,
                               has_gc, NB, interpret)

    const3 = lambda bi, jr: (0, 0, 0)
    rev = lambda bi, jr: (bi, nT - 1 - jr, 0)

    in_specs = [
        pl.BlockSpec((NB, TT, R), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, 1, sum_dg, R),
                     lambda bi, jr: (bi, nT - 1 - jr, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, TT, S), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, TT, R), rev, memory_space=pltpu.VMEM),
    ]
    operands = [x, snaps, dskip, dxout]
    if has_cond:
        M = cfg.mel.num_mels
        in_specs.append(pl.BlockSpec((NB, TT, M), rev,
                                     memory_space=pltpu.VMEM))
        operands.append(y.astype(jnp.bfloat16))
    if has_gc:
        in_specs.append(pl.BlockSpec((NB, Lg, 2 * R),
                                     lambda bi, jr: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(g)
    wops = (wz, b, wrs, bres)
    in_specs += [pl.BlockSpec(o.shape, (lambda bi, jr, nd=o.ndim: (0,) * nd),
                              memory_space=pltpu.VMEM) for o in wops]
    operands += list(wops)
    if has_cond:
        vc = gw["v_cond"].reshape(Lg, M, 2 * R).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec(vc.shape, lambda bi, jr: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(vc)

    out_specs = [
        pl.BlockSpec((NB, TT, R), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((Lg, 2 * R, 2 * R), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Lg, 2 * R), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Lg, R, R + S), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Lg, R), lambda *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, T, R), jnp.float32),
        jax.ShapeDtypeStruct((Lg, 2 * R, 2 * R), jnp.float32),
        jax.ShapeDtypeStruct((Lg, 2 * R), jnp.float32),
        jax.ShapeDtypeStruct((Lg, R, R + S), jnp.float32),
        jax.ShapeDtypeStruct((Lg, R), jnp.float32),
    ]
    if has_cond:
        out_specs += [
            pl.BlockSpec((Lg, M, 2 * R), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, TT, M), rev, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Lg, M, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((B, T, M), jnp.float32),
        ]
    if has_gc:
        out_specs.append(pl.BlockSpec((NB, Lg, 2 * R),
                                      lambda bi, jr: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, Lg, 2 * R), jnp.float32))
    dz_ring_shape = ((sum_dg, R) if NB == 1 else (NB, sum_dg, R))
    outs = pl.pallas_call(
        kernel,
        grid=(B // NB, nT),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((Lg + 1, NB * TT, R), jnp.bfloat16),  # xs stash
            pltpu.VMEM(dz_ring_shape, jnp.float32),          # dz rings
            pltpu.VMEM((_winpad(cfg) + TT, R), jnp.float32),
            pltpu.VMEM((TT + _winpad(cfg), R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    dx, dwz, db, dwrs, dbres = outs[:5]
    dgw = {
        "w_cur": dwz[:, :R, :].reshape(Lg, R, 2, R
                                       ).astype(gw["w_cur"].dtype),
        "w_prev": dwz[:, R:, :].reshape(Lg, R, 2, R
                                        ).astype(gw["w_prev"].dtype),
        "b": db.reshape(Lg, 2, R).astype(gw["b"].dtype),
        "w_res": dwrs[..., :R].astype(gw["w_res"].dtype),
        "w_skip": dwrs[..., R:].astype(gw["w_skip"].dtype),
        "b_res": dbres.astype(gw["b_res"].dtype),
        # skip bias enters the sum at every position of every layer
        "b_skip": jnp.broadcast_to(jnp.sum(dskip, axis=(0, 1)), (Lg, S)
                                   ).astype(gw["b_skip"].dtype),
    }
    dy = dg = None
    k = 5
    if has_cond:
        dgw["v_cond"] = outs[k].reshape(Lg, cfg.mel.num_mels, 2, R
                                        ).astype(gw["v_cond"].dtype)
        dy = outs[k + 1].astype(y.dtype)
        k += 2
    if has_gc:
        dg = outs[k]                                       # [B, Lg, 2R] f32
    # skip_in passes through additively -> its cotangent is dskip unchanged
    return dx, dskip, dgw, dy, dg


group_apply.defvjp(_group_vjp_fwd, _group_vjp_bwd)


def forward_skip_fused(params, cfg: WaveNetConfig, x: jax.Array,
                       interpret: bool = False, tile=None,
                       y=None, g=None, nb=None) -> jax.Array:
    """Embedded input [B, T, R] -> skip-sum [B, T, S] f32 via the fused
    per-group kernels.  y: optional [B, T, M] upsampled conditioning
    features (cfg.mel set); g: optional [L, B, 2, R] f32 global-conditioning
    gate offsets (models.wavenet.global_cond_offsets) — time-constant, so the
    kernels add one [2R] row per (batch row, layer) instead of a [T, 2R]
    stream, and the cotangent path back to g_embed/v_global rides autodiff
    through the per-group slice/transpose below.

    nb: (fwd, bwd) batch rows per grid step; None auto-picks via pick_nb
    (multi-row kernels — identical math, shorter serialized grid chain)."""
    B, T, R = x.shape
    TT = tile or pick_tile(cfg, T)
    if not TT:
        raise ValueError(f"T={T} is not tileable for this config; gate fused "
                         f"paths on train_stack.supported(cfg, T)")
    if T % TT:
        raise ValueError(f"tile={TT} does not divide T={T}: the grid would "
                         f"leave the last {T % TT} rows unwritten")
    auto_nb = nb is None
    if auto_nb:
        nb = pick_nb(cfg, T, B, TT=TT)
    nb = tuple(nb)
    # the NB_HW_MAX miscompile fence is HARDWARE-only: interpret mode is
    # bit-exact at any nb (round-2 advisor — keeps nb > 4 testable and a
    # future-chip recalibration observable without editing the constant)
    groups = plan_dils(cfg, cfg.dilations, TT, nb, hw=not interpret)
    if not groups and auto_nb and nb != (1, 1):
        # auto-pick raced a config edge: fall back to the proven layout
        nb = (1, 1)
        groups = group_plan(cfg, TT)
    if not groups:
        raise ValueError(f"no feasible group plan at nb={nb} (VMEM budget, "
                         f"or rows > NB_HW_MAX={NB_HW_MAX} which miscompile "
                         f"on hardware); gate on supported() (explicitly "
                         f"requested nb is honored, never silently "
                         f"downgraded)")
    has_cond = y is not None
    skip = jnp.zeros((B, T, cfg.skip_channels), jnp.float32)
    # f32 stream holding bf16-rounded values (see _fwd_kernel docs);
    # reduce_precision so XLA cannot fold the rounding away
    x_g = jax.lax.reduce_precision(x, 8, 7)
    for lo, hi in groups:
        gw = _slice_group(params, lo, hi, has_cond)
        g_g = None
        if g is not None:
            g_g = g[lo:hi].transpose(1, 0, 2, 3).reshape(B, hi - lo, 2 * R)
        skip, x_g = group_apply(cfg, interpret, TT,
                                tuple(cfg.dilations[lo:hi]), nb,
                                x_g, skip, gw, y, g_g)
    return skip
