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


def _group_sizes(cfg: WaveNetConfig, TT: int, lo: int, hi: int):
    R, S = cfg.residual_channels, cfg.skip_channels
    Lg = hi - lo
    sum_dg = sum(_pad8(d) for d in cfg.dilations[lo:hi])
    maxd = _winpad(cfg)
    M = cfg.mel.num_mels if cfg.mel is not None else 0
    w = 2 * Lg * (4 * R * R + R * R + R * S) + 2 * Lg * M * 2 * R
    dw = (4 * Lg * (4 * R * R + R * R + R * S + 3 * R)
          + 4 * Lg * M * 2 * R + 8 * TT * M)
    fwd = (w + 2 * sum_dg * R + 2 * (maxd + TT) * R
           + 2 * (2 * TT * R * 2 + 4 * TT * S * 2 + 2 * sum_dg * R
                  + 2 * TT * R))
    bwd = (w + dw + 2 * (Lg + 1) * TT * R
           + 4 * sum_dg * R + 2 * (maxd + TT) * R + 4 * (TT + maxd) * R
           + 2 * (2 * TT * R * 2 + 4 * TT * R * 4 + 4 * TT * S
                  + 2 * sum_dg * R))
    return fwd, bwd


def group_plan(cfg: WaveNetConfig, TT: int) -> List[Tuple[int, int]]:
    """Fewest contiguous layer groups whose fwd AND bwd kernels fit VMEM."""
    L = cfg.num_layers
    groups, lo = [], 0
    while lo < L:
        hi = lo + 1
        if max(_group_sizes(cfg, TT, lo, hi)) > VMEM_BUDGET:
            return []                                   # cannot fit at all
        while hi < L and max(_group_sizes(cfg, TT, lo, hi + 1)) <= VMEM_BUDGET:
            hi += 1
        groups.append((lo, hi))
        lo = hi
    return groups


def supported(cfg: WaveNetConfig, T: int) -> bool:
    TT = pick_tile(cfg, T)
    return bool(TT) and bool(group_plan(cfg, TT))


# ---------------------------------------------------------------------------
# forward kernel for one layer group
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: WaveNetConfig, TT: int, lo: int, hi: int,
                first_group: bool, has_cond: bool, *refs):
    if has_cond:
        (xin_ref, skip_in_ref, y_ref,
         wcur_ref, wprev_ref, b_ref, wres_ref, bres_ref, wskip_ref,
         bskip_ref, vcond_ref,
         skip_ref, snaps_ref, xout_ref, rings, xbuf) = refs
    else:
        (xin_ref, skip_in_ref,
         wcur_ref, wprev_ref, b_ref, wres_ref, bres_ref, wskip_ref,
         bskip_ref,
         skip_ref, snaps_ref, xout_ref, rings, xbuf) = refs
        y_ref = vcond_ref = None
    R = cfg.residual_channels
    dils = cfg.dilations[lo:hi]
    offs, _ = _ring_layout(dils)                 # group-local padded offsets
    j = pl.program_id(1)
    maxd = _winpad(cfg)

    @pl.when(j == 0)
    def _():
        rings[:] = jnp.zeros_like(rings)

    snaps_ref[0, 0] = rings[:]                   # ring state at tile START

    # f32 residual carry; bf16 only at MXU inputs / ring+stash stores
    x = xin_ref[0].astype(jnp.float32)           # [TT, R]
    skip = (jnp.zeros((TT, cfg.skip_channels), jnp.float32)
            if first_group else skip_in_ref[0])
    y = y_ref[0] if has_cond else None           # [TT, M] bf16

    for li, (d, off) in enumerate(zip(dils, offs)):
        pad = _pad8(d)
        x_b = x.astype(jnp.bfloat16)
        # Causal shift via scratch window.  ALL stores are 8-row aligned
        # (padded ring regions); only loads use misaligned offsets — Mosaic
        # miscompiles misaligned vector slices AND misaligned-destination
        # stores (both found by hardware-vs-interpret bisects).
        xbuf[maxd:] = x_b.astype(jnp.float32)
        xbuf[maxd - pad:maxd] = rings[off:off + pad].astype(jnp.float32)
        # xp via an aligned full-buffer load + roll: BOTH misaligned vector
        # slices and misaligned ref loads of nonzero data miscompile under
        # Mosaic (three hardware-vs-interpret bisects).  The buffer is f32
        # because tpu.dynamic_rotate only handles 32-bit lanes; values are
        # bf16-representable so the round-trip is exact.
        xp = pltpu.roll(xbuf[:], TT + d, 0)[:TT].astype(jnp.bfloat16)
        rings[off:off + pad] = xbuf[maxd + TT - pad:maxd + TT
                                    ].astype(jnp.bfloat16)
        z = (jnp.dot(x_b, wcur_ref[li], preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev_ref[li], preferred_element_type=jnp.float32)
             + b_ref[li])                        # [TT, 2R] f32
        if has_cond:                             # paper eq.3: V*y into gate
            z = z + jnp.dot(y, vcond_ref[li],
                            preferred_element_type=jnp.float32)
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        skip = (skip
                + jnp.dot(h, wskip_ref[li], preferred_element_type=jnp.float32)
                + bskip_ref[li])
        x = x + (jnp.dot(h, wres_ref[li], preferred_element_type=jnp.float32)
                 + bres_ref[li])

    skip_ref[0] = skip
    xout_ref[0] = x.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# backward kernel for one layer group (tiles right-to-left)
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: WaveNetConfig, TT: int, nT: int, lo: int, hi: int,
                has_cond: bool, *refs):
    """Backward over layers [lo, hi).  xin is the stashed input of layer lo;
    dxin is the cotangent of layer hi's input (zeros for the top group)."""
    if has_cond:
        (xin_ref, snaps_ref, dskip_ref, dxin_ref, y_ref,
         wcur_ref, wprev_ref, b_ref, wres_ref, bres_ref, wskip_ref,
         vcond_ref,
         dx_ref, dwcur_ref, dwprev_ref, db_ref,
         dwres_ref, dbres_ref, dwskip_ref, dvcond_ref, dy_ref,
         xs, dz_rings, xbuf, dbuf) = refs
    else:
        (xin_ref, snaps_ref, dskip_ref, dxin_ref,
         wcur_ref, wprev_ref, b_ref, wres_ref, bres_ref, wskip_ref,
         dx_ref, dwcur_ref, dwprev_ref, db_ref,
         dwres_ref, dbres_ref, dwskip_ref,
         xs, dz_rings, xbuf, dbuf) = refs
        y_ref = vcond_ref = dvcond_ref = dy_ref = None
    R = cfg.residual_channels
    dils = cfg.dilations[lo:hi]
    offs, _ = _ring_layout(dils)                 # group-local padded offsets
    Lg = hi - lo
    bi = pl.program_id(0)
    jr = pl.program_id(1)                        # 0 .. nT-1, tile = nT-1-jr
    maxd = _winpad(cfg)

    def _dg(a, b, ca, cb, prec=jnp.float32):
        return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                   preferred_element_type=prec)

    @pl.when(jnp.logical_and(bi == 0, jr == 0))
    def _():
        zrefs = [dwcur_ref, dwprev_ref, db_ref, dwres_ref, dbres_ref,
                 dwskip_ref]
        if has_cond:
            zrefs.append(dvcond_ref)
        for ref in zrefs:
            ref[:] = jnp.zeros_like(ref)

    @pl.when(jr == 0)                            # new batch row: clear dz ring
    def _():
        dz_rings[:] = jnp.zeros_like(dz_rings)

    # ---- recompute this tile's group-layer inputs from ring snapshots ----
    x = xin_ref[0].astype(jnp.float32)
    xs[0] = x.astype(jnp.bfloat16)
    for li, (d, off) in enumerate(zip(dils, offs)):
        pad = _pad8(d)
        x_b = x.astype(jnp.bfloat16)
        xbuf[maxd:] = x_b.astype(jnp.float32)
        xbuf[maxd - pad:maxd] = snaps_ref[0, 0, off:off + pad
                                          ].astype(jnp.float32)
        xp = pltpu.roll(xbuf[:], TT + d, 0)[:TT].astype(jnp.bfloat16)
        z = (jnp.dot(x_b, wcur_ref[li], preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev_ref[li], preferred_element_type=jnp.float32)
             + b_ref[li])
        if has_cond:
            z = z + jnp.dot(y_ref[0], vcond_ref[li],
                            preferred_element_type=jnp.float32)
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        x = x + (jnp.dot(h, wres_ref[li], preferred_element_type=jnp.float32)
                 + bres_ref[li])
        xs[li + 1] = x.astype(jnp.bfloat16)

    # ---- reverse pass: GRADIENTS STAY f32 END-TO-END (quantizing them to
    # bf16 measurably degraded convergence); forward residuals (h, x) are
    # bf16, cast up exactly for the f32 MXU dots ----
    dskip = dskip_ref[0]                         # [TT, S] f32
    dx = dxin_ref[0]                             # [TT, R] f32 (d x_{hi})
    if has_cond:
        y_f = y_ref[0].astype(jnp.float32)       # [TT, M]
        dy = jnp.zeros_like(y_f)

    for li in reversed(range(Lg)):
        d, off = dils[li], offs[li]
        pad = _pad8(d)
        x_lb16 = xs[li]                          # bf16, as the fwd consumed
        xbuf[maxd:] = x_lb16.astype(jnp.float32)
        xbuf[maxd - pad:maxd] = snaps_ref[0, 0, off:off + pad
                                          ].astype(jnp.float32)
        xp_l = pltpu.roll(xbuf[:], TT + d, 0)[:TT].astype(jnp.bfloat16)
        z = (jnp.dot(x_lb16, wcur_ref[li], preferred_element_type=jnp.float32)
             + jnp.dot(xp_l, wprev_ref[li], preferred_element_type=jnp.float32)
             + b_ref[li])
        if has_cond:
            z = z + jnp.dot(y_ref[0], vcond_ref[li],
                            preferred_element_type=jnp.float32)
        tf = jnp.tanh(z[:, :R])
        sg = jax.nn.sigmoid(z[:, R:])
        h = (tf * sg).astype(jnp.bfloat16).astype(jnp.float32)

        dbres_ref[li:li + 1, :] += jnp.sum(dx, axis=0, keepdims=True)
        dh = (_dg(dskip, wskip_ref[li].astype(jnp.float32), 1, 1)
              + _dg(dx, wres_ref[li].astype(jnp.float32), 1, 1))
        dwskip_ref[li] += _dg(h, dskip, 0, 0)        # h^T @ dskip
        dwres_ref[li] += _dg(h, dx, 0, 0)            # h^T @ dx

        dzf = dh * sg * (1.0 - tf * tf)
        dzg = dh * tf * sg * (1.0 - sg)
        dz = jnp.concatenate([dzf, dzg], axis=1)     # [TT, 2R] f32

        dwcur_ref[li] += _dg(x_lb16.astype(jnp.float32), dz, 0, 0)
        dwprev_ref[li] += _dg(xp_l.astype(jnp.float32), dz, 0, 0)
        db_ref[li:li + 1, :] += jnp.sum(dz, axis=0, keepdims=True)
        if has_cond:
            dvcond_ref[li] += _dg(y_f, dz, 0, 0)          # y^T @ dz
            dy = dy + _dg(dz, vcond_ref[li].astype(jnp.float32), 1, 1)

        dprev = _dg(dz, wprev_ref[li].astype(jnp.float32), 1, 1)  # [TT, R]
        # transposed causal shift via scratch window: dx[s] += dprev[s+d];
        # rows s >= TT-d come from the LATER tile's dprev head (dz ring)
        dbuf[:TT] = dprev
        dbuf[TT:TT + pad] = dz_rings[off:off + pad]
        shifted = pltpu.roll(dbuf[:], TT + maxd - d, 0)[:TT]
        dz_rings[off:off + pad] = dbuf[:pad]     # head of dprev, aligned

        dx = dx + _dg(dz, wcur_ref[li].astype(jnp.float32), 1, 1) + shifted

    dx_ref[0] = dx
    if has_cond:
        dy_ref[0] = dy


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _stacked(params):
    return tuple(params[k] for k in
                 ("w_cur", "w_prev", "b", "w_res", "b_res", "w_skip",
                  "b_skip"))


def _prep_weights(cfg, w_cur, w_prev, b, w_res, b_res, w_skip, b_skip):
    L, R = cfg.num_layers, cfg.residual_channels
    bf = jnp.bfloat16
    return (
        w_cur.reshape(L, R, 2 * R).astype(bf),
        w_prev.reshape(L, R, 2 * R).astype(bf),
        b.reshape(L, 1, 2 * R).astype(jnp.float32),
        w_res.astype(bf),
        b_res.reshape(L, 1, R).astype(jnp.float32),
        w_skip.astype(bf),
        b_skip.reshape(L, 1, -1).astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def stack_skip_sum(cfg: WaveNetConfig, interpret: bool, tile, x,
                   w_cur, w_prev, b, w_res, b_res, w_skip, b_skip):
    """[B, T, R] embedded input -> [B, T, S] f32 skip-sum (fused stack).
    tile=None picks the largest valid time tile; tests pass small tiles to
    exercise the cross-tile ring carry and the group chaining."""
    skip, _, _ = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res,
                      b_res, w_skip, b_skip)
    return skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def stack_skip_sum_cond(cfg: WaveNetConfig, interpret: bool, tile, x, y,
                        w_cur, w_prev, b, w_res, b_res, w_skip, b_skip,
                        v_cond):
    """Conditional variant: y [B, T, M] upsampled mel features enter every
    gate as y @ v_cond[l] (WaveNet paper eq.3)."""
    skip, _, _ = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res,
                      b_res, w_skip, b_skip, y=y, v_cond=v_cond)
    return skip


def _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res, b_res, w_skip,
         b_skip, y=None, v_cond=None):
    B, T, R = x.shape
    TT = tile or pick_tile(cfg, T)
    if not TT:
        raise ValueError(f"T={T} is not tileable for this config; gate fused "
                         f"paths on train_stack.supported(cfg, T)")
    nT = T // TT
    S = cfg.skip_channels
    has_cond = y is not None
    wops = _prep_weights(cfg, w_cur, w_prev, b, w_res, b_res, w_skip, b_skip)
    if has_cond:
        L, M = cfg.num_layers, cfg.mel.num_mels
        vc = v_cond.reshape(L, M, 2 * R).astype(jnp.bfloat16)
        y_b = y.astype(jnp.bfloat16)
    groups = group_plan(cfg, TT)

    const = lambda *_: (0, 0, 0)
    blk = lambda bi, j: (bi, j, 0)

    skip = jnp.zeros((B, T, S), jnp.float32)
    x_g = x.astype(jnp.bfloat16)
    snaps_list, stash_list = [], []
    for gi, (lo, hi) in enumerate(groups):
        _, sum_dg = _ring_layout(cfg.dilations[lo:hi])
        gops = tuple(w[lo:hi] for w in wops)
        kernel = functools.partial(_fwd_kernel, cfg, TT, lo, hi, gi == 0,
                                   has_cond)
        in_specs = [
            pl.BlockSpec((1, TT, R), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, S), blk, memory_space=pltpu.VMEM),
        ]
        operands = [x_g, skip]
        if has_cond:
            in_specs.append(pl.BlockSpec((1, TT, cfg.mel.num_mels), blk,
                                         memory_space=pltpu.VMEM))
            operands.append(y_b)
        in_specs += [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
                     for w in gops]
        operands += list(gops)
        if has_cond:
            in_specs.append(pl.BlockSpec(vc[lo:hi].shape, const,
                                         memory_space=pltpu.VMEM))
            operands.append(vc[lo:hi])
        skip_alias = 1
        skip, snaps_g, x_next = pl.pallas_call(
            kernel,
            grid=(B, nT),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, TT, S), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sum_dg, R),
                             lambda bi, j: (bi, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TT, R), blk, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, T, S), jnp.float32),
                jax.ShapeDtypeStruct((B, nT, sum_dg, R), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, T, R), jnp.bfloat16),
            ),
            input_output_aliases={skip_alias: 0},     # skip accumulator
            scratch_shapes=[
                pltpu.VMEM((sum_dg, R), jnp.bfloat16),
                pltpu.VMEM((_winpad(cfg) + TT, R), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(*operands)
        snaps_list.append(snaps_g)
        stash_list.append(x_g)                   # INPUT of group gi
        x_g = x_next
    return skip, tuple(snaps_list), tuple(stash_list)


def _vjp_fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res, b_res,
             w_skip, b_skip):
    skip, snaps, stash = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b,
                              w_res, b_res, w_skip, b_skip)
    res = (snaps, stash, w_cur, w_prev, b, w_res, b_res, w_skip, None, None)
    return skip, res


def _vjp_fwd_cond(cfg, interpret, tile, x, y, w_cur, w_prev, b, w_res,
                  b_res, w_skip, b_skip, v_cond):
    skip, snaps, stash = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b,
                              w_res, b_res, w_skip, b_skip, y=y,
                              v_cond=v_cond)
    res = (snaps, stash, w_cur, w_prev, b, w_res, b_res, w_skip, y, v_cond)
    return skip, res


def _vjp_bwd_cond(cfg, interpret, tile, res, dskip):
    grads = _vjp_bwd(cfg, interpret, tile, res, dskip)
    # reorder to the cond signature (x, y, w..., b_skip, v_cond)
    dx, dwcur, dwprev, db, dwres, dbres, dwskip, dbskip, dy, dvcond = grads
    return (dx, dy, dwcur, dwprev, db, dwres, dbres, dwskip, dbskip, dvcond)


def _vjp_bwd(cfg, interpret, tile, res, dskip):
    snaps, stash, w_cur, w_prev, b, w_res, b_res, w_skip, y, v_cond = res
    has_cond = y is not None
    B, T, R = stash[0].shape
    L = cfg.num_layers
    S = cfg.skip_channels
    TT = tile or pick_tile(cfg, T)
    nT = T // TT
    wops = _prep_weights(cfg, w_cur, w_prev, b, w_res, b_res, w_skip,
                         jnp.zeros((L, S), jnp.float32))[:6]
    if has_cond:
        M = cfg.mel.num_mels
        vc = v_cond.reshape(L, M, 2 * R).astype(jnp.bfloat16)
        y_b = y.astype(jnp.bfloat16)
        dy_total = jnp.zeros((B, T, M), jnp.float32)
        dvc_parts = [None] * 0
    groups = group_plan(cfg, TT)

    const = lambda *_: (0, 0, 0)
    rev = lambda bi, jr: (bi, nT - 1 - jr, 0)

    parts = [None] * len(groups)
    vparts = [None] * len(groups)
    dx = jnp.zeros((B, T, R), jnp.float32)       # d x_L == 0 (head uses skip)
    for gi in reversed(range(len(groups))):
        lo, hi = groups[gi]
        Lg = hi - lo
        _, sum_dg = _ring_layout(cfg.dilations[lo:hi])
        gops = tuple(w[lo:hi] for w in wops)
        kernel = functools.partial(_bwd_kernel, cfg, TT, nT, lo, hi,
                                   has_cond)
        in_specs = [
            pl.BlockSpec((1, TT, R), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sum_dg, R),
                         lambda bi, jr: (bi, nT - 1 - jr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, R), rev, memory_space=pltpu.VMEM),
        ]
        operands = [stash[gi], snaps[gi], dskip, dx]
        if has_cond:
            in_specs.append(pl.BlockSpec((1, TT, M), rev,
                                         memory_space=pltpu.VMEM))
            operands.append(y_b)
        in_specs += [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
                     for w in gops]
        operands += list(gops)
        if has_cond:
            in_specs.append(pl.BlockSpec(vc[lo:hi].shape, const,
                                         memory_space=pltpu.VMEM))
            operands.append(vc[lo:hi])
        out_specs = [
            pl.BlockSpec((1, TT, R), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, R, 2 * R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, R, 2 * R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, 2 * R), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, R, R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, R), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, R, S), const, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, T, R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, R, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, R, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, R, R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, R), jnp.float32),
            jax.ShapeDtypeStruct((Lg, R, S), jnp.float32),
        ]
        if has_cond:
            out_specs += [
                pl.BlockSpec((Lg, M, 2 * R), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TT, M), rev, memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((Lg, M, 2 * R), jnp.float32),
                jax.ShapeDtypeStruct((B, T, M), jnp.float32),
            ]
        outs = pl.pallas_call(
            kernel,
            grid=(B, nT),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[
                pltpu.VMEM((Lg + 1, TT, R), jnp.bfloat16),      # xs stash
                pltpu.VMEM((sum_dg, R), jnp.float32),           # dz rings
                pltpu.VMEM((_winpad(cfg) + TT, R), jnp.float32),
                pltpu.VMEM((TT + _winpad(cfg), R), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(*operands)
        dx = outs[0]
        if has_cond:
            parts[gi] = outs[1:7]
            vparts[gi] = outs[7]
            dy_total = dy_total + outs[8]
        else:
            parts[gi] = outs[1:]

    dwcur, dwprev, db, dwres, dbres, dwskip = (
        jnp.concatenate([p[i] for p in parts], axis=0) for i in range(6))

    dwcur = dwcur.reshape(L, R, 2, R).astype(w_cur.dtype)
    dwprev = dwprev.reshape(L, R, 2, R).astype(w_prev.dtype)
    db = db.reshape(L, 2, R).astype(b.dtype)
    dbskip = jnp.broadcast_to(jnp.sum(dskip, axis=(0, 1)), (L, S)
                              ).astype(b.dtype)
    dy = dvcond = None
    if has_cond:
        M = cfg.mel.num_mels
        dvcond = jnp.concatenate(vparts, axis=0).reshape(
            L, M, 2, R).astype(v_cond.dtype)
        dy = dy_total.astype(y.dtype)
    return (dx.astype(stash[0].dtype), dwcur, dwprev, db,
            dwres.astype(w_res.dtype), dbres.astype(b_res.dtype),
            dwskip.astype(w_skip.dtype), dbskip, dy, dvcond)


def _vjp_bwd_uncond(cfg, interpret, tile, res, dskip):
    return _vjp_bwd(cfg, interpret, tile, res, dskip)[:8]


stack_skip_sum.defvjp(_vjp_fwd, _vjp_bwd_uncond)
stack_skip_sum_cond.defvjp(_vjp_fwd_cond, _vjp_bwd_cond)


def forward_skip_fused(params, cfg: WaveNetConfig, x: jax.Array,
                       interpret: bool = False, tile=None,
                       y=None) -> jax.Array:
    """Embedded input [B, T, R] -> skip-sum [B, T, S] via the fused kernels.
    y: optional [B, T, M] upsampled conditioning features (cfg.mel set)."""
    if y is not None:
        return stack_skip_sum_cond(cfg, interpret, tile, x, y,
                                   *_stacked(params), params["v_cond"])
    return stack_skip_sum(cfg, interpret, tile, x, *_stacked(params))
