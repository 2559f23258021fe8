"""Fused training-path Pallas kernel: the ENTIRE dilated-causal conv stack
(all L gated residual layers) as one kernel with a custom VJP.

This is the BASELINE-mandated fused training kernel ("Pallas kernels fuse the
dilated causal conv + gating + residual/skip path").  Why fusion wins here:
the XLA scan path round-trips x, z, h, and the f32 skip accumulator through
HBM for every layer (~60 MB/layer on the small preset); this kernel walks the
sequence ONCE, keeping the entire layer pipeline VMEM-resident:

  * grid (B, T/TT) with time tiles processed left-to-right; per-layer causal
    left context lives in a compact VMEM ring [sum(dilations), R] carried
    across tiles (same ring structure as the decode kernel, at tile
    granularity);
  * HBM traffic per step: read the embedded input once, write the skip-sum
    once — weights and rings stay on chip (constant-index blocks);
  * the only thing the head needs is the skip-sum (WaveNet paper Fig 4), so
    the residual stream never leaves the chip;
  * backward: "ring-snapshot rematerialization" — the forward stores each
    tile's ring state ([B, nT, sum_d, R], a few MB), and the backward
    RECOMPUTES the tile's layer inputs from that snapshot while walking
    tiles right-to-left, accumulating weight grads in VMEM output blocks and
    propagating the transposed causal shift through a dz ring.  No
    [L, B, T, R] activation stash, no second XLA-level forward.

Restrictions (callers fall back to the XLA scan path otherwise —
models.wavenet.forward_logits handles the dispatch):
  * unconditional stack (mel conditioning adds a per-layer gate input; lands
    in a later revision);
  * T % TT == 0 and TT >= max_dilation;
  * f32 weight-grad blocks for all L layers must fit VMEM (true for the
    tiny/small/fastgen presets; the `full` preset needs ~18 MB and falls
    back for now).

Equivalence vs the scan path is tested in interpret mode (tests/
test_pallas_train.py) for both outputs and all gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.config import WaveNetConfig

VMEM_BUDGET = 13 * 1024 * 1024


def _ring_offsets(cfg: WaveNetConfig):
    offs, acc = [], 0
    for d in cfg.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs), acc


def pick_tile(cfg: WaveNetConfig, T: int) -> int:
    """Largest power-of-two tile >= max_dilation that divides T, capped."""
    tt = max(cfg.max_dilation, 512)
    while tt > cfg.max_dilation and T % tt:
        tt //= 2
    if T % tt or tt < cfg.max_dilation:
        return 0
    return tt


def supported(cfg: WaveNetConfig, T: int) -> bool:
    if cfg.mel is not None:
        return False
    TT = pick_tile(cfg, T)
    if not TT:
        return False
    L, R, S = cfg.num_layers, cfg.residual_channels, cfg.skip_channels
    _, sum_d = _ring_offsets(cfg)
    # fwd working set (bf16 weights + rings + tiles) and bwd extras
    # (f32 dW blocks + f32 xs stash + f32 dz ring) must fit VMEM
    wbytes = 2 * L * (4 * R * R + R * R + R * S)
    dwbytes = 4 * L * (4 * R * R + R * R + R * S) + 4 * L * 3 * R
    bwd = (dwbytes + 4 * (L + 1) * TT * R + 4 * sum_d * R + 2 * sum_d * R
           + 4 * TT * S * 2 + wbytes)
    return bwd < VMEM_BUDGET


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: WaveNetConfig, TT: int,
                xin_ref, wcur_ref, wprev_ref, b_ref,
                wres_ref, bres_ref, wskip_ref, bskip_ref,
                skip_ref, snaps_ref,
                rings, xbuf):
    R = cfg.residual_channels
    dils = cfg.dilations
    offs, _ = _ring_offsets(cfg)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        rings[:] = jnp.zeros_like(rings)

    snaps_ref[0, 0] = rings[:]                   # ring state at tile START

    # The residual stream is CARRIED IN f32 (VMEM-resident, so free) and
    # rounded to bf16 only at matmul inputs/ring stores: on TPU, XLA compiles
    # the scan path with excess precision — elementwise chains (residual
    # adds, gate) effectively stay f32 — and a true-bf16 carry measurably
    # degraded training convergence vs that path.
    x = xin_ref[0].astype(jnp.float32)           # [TT, R]
    skip = jnp.zeros((TT, cfg.skip_channels), jnp.float32)

    maxd = cfg.max_dilation
    for l, (d, off) in enumerate(zip(dils, offs)):
        x_b = x.astype(jnp.bfloat16)
        # Causal shift via a scratch window buffer with STATIC offsets:
        # Mosaic miscompiles vector concat+slice at non-sublane-aligned
        # boundaries (outputs wrong past the first 8 rows; found by a
        # hardware-vs-interpret bisect), so xp is assembled with ref
        # stores/loads instead.
        xbuf[maxd:] = x_b
        xbuf[maxd - d:maxd] = rings[off:off + d]
        xp = xbuf[maxd - d:maxd - d + TT]
        rings[off:off + d] = x_b[TT - d:]
        z = (jnp.dot(x_b, wcur_ref[l], preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev_ref[l], preferred_element_type=jnp.float32)
             + b_ref[l])                         # [TT, 2R] f32
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        skip = (skip
                + jnp.dot(h, wskip_ref[l], preferred_element_type=jnp.float32)
                + bskip_ref[l])
        x = x + (jnp.dot(h, wres_ref[l], preferred_element_type=jnp.float32)
                 + bres_ref[l])

    skip_ref[0] = skip


# ---------------------------------------------------------------------------
# backward kernel (tiles right-to-left; recompute from ring snapshots)
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: WaveNetConfig, TT: int, nT: int,
                xin_ref, snaps_ref, dskip_ref,
                wcur_ref, wprev_ref, b_ref, wres_ref, bres_ref, wskip_ref,
                dx_ref, dwcur_ref, dwprev_ref, db_ref,
                dwres_ref, dbres_ref, dwskip_ref,
                xs, dz_rings, xbuf, dbuf):
    R = cfg.residual_channels
    L = cfg.num_layers
    dils = cfg.dilations
    offs, _ = _ring_offsets(cfg)
    bi = pl.program_id(0)
    jr = pl.program_id(1)                        # 0 .. nT-1, tile = nT-1-jr

    def _dg(a, b, ca, cb, prec=jnp.float32):
        # contraction without materialised transposes (Mosaic-friendly)
        return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                   preferred_element_type=prec)

    @pl.when(jnp.logical_and(bi == 0, jr == 0))
    def _():
        for ref in (dwcur_ref, dwprev_ref, db_ref, dwres_ref, dbres_ref,
                    dwskip_ref):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(jr == 0)                            # new batch row: clear dz ring
    def _():
        dz_rings[:] = jnp.zeros_like(dz_rings)

    # ---- recompute this tile's layer inputs from the ring snapshot ----
    # mirrors the forward exactly: f32 carry, bf16 matmul inputs
    maxd = cfg.max_dilation
    x = xin_ref[0].astype(jnp.float32)
    xs[0] = x.astype(jnp.bfloat16)
    for l, (d, off) in enumerate(zip(dils, offs)):
        x_b = x.astype(jnp.bfloat16)
        # scratch-window shift (see _fwd_kernel comment re Mosaic concat bug)
        xbuf[maxd:] = x_b
        xbuf[maxd - d:maxd] = snaps_ref[0, 0, off:off + d]
        xp = xbuf[maxd - d:maxd - d + TT]
        z = (jnp.dot(x_b, wcur_ref[l], preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev_ref[l], preferred_element_type=jnp.float32)
             + b_ref[l])
        h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
             ).astype(jnp.bfloat16)
        x = x + (jnp.dot(h, wres_ref[l], preferred_element_type=jnp.float32)
                 + bres_ref[l])
        xs[l + 1] = x.astype(jnp.bfloat16)

    # ---- reverse pass ----
    # GRADIENTS STAY f32 END-TO-END (dz/dx/dskip and the dz ring): XLA's
    # autodiff of the scan path keeps cotangents in f32 and quantizing them
    # to bf16 here measurably degraded convergence (loss 2.65 vs 2.30 at
    # step 300 on the small preset).  Only the saved forward residuals
    # (h, x) are bf16 — cast up exactly for the f32 MXU dots.
    dskip = dskip_ref[0]                         # [TT, S] f32
    dx = jnp.zeros((TT, R), jnp.float32)         # d/dx_L == 0 (head uses skip)

    for l in reversed(range(L)):
        d, off = dils[l], offs[l]
        x_lb16 = xs[l]                           # bf16, as the fwd consumed
        xbuf[maxd:] = x_lb16
        xbuf[maxd - d:maxd] = snaps_ref[0, 0, off:off + d]
        xp_l = xbuf[maxd - d:maxd - d + TT]
        z = (jnp.dot(x_lb16, wcur_ref[l], preferred_element_type=jnp.float32)
             + jnp.dot(xp_l, wprev_ref[l], preferred_element_type=jnp.float32)
             + b_ref[l])
        tf = jnp.tanh(z[:, :R])
        sg = jax.nn.sigmoid(z[:, R:])
        # h as the forward computed it (bf16), held in f32 exactly
        h = (tf * sg).astype(jnp.bfloat16).astype(jnp.float32)

        dbres_ref[l:l + 1, :] += jnp.sum(dx, axis=0, keepdims=True)
        wskip_f = wskip_ref[l].astype(jnp.float32)
        wres_f = wres_ref[l].astype(jnp.float32)
        dh = (_dg(dskip, wskip_f, 1, 1)              # dskip @ wskip^T
              + _dg(dx, wres_f, 1, 1))               # dx @ wres^T
        dwskip_ref[l] += _dg(h, dskip, 0, 0)         # h^T @ dskip
        dwres_ref[l] += _dg(h, dx, 0, 0)             # h^T @ dx

        dzf = dh * sg * (1.0 - tf * tf)
        dzg = dh * tf * sg * (1.0 - sg)
        dz = jnp.concatenate([dzf, dzg], axis=1)     # [TT, 2R] f32

        xs_f = x_lb16.astype(jnp.float32)
        xp_f = xp_l.astype(jnp.float32)
        dwcur_ref[l] += _dg(xs_f, dz, 0, 0)          # x^T @ dz
        dwprev_ref[l] += _dg(xp_f, dz, 0, 0)         # xp^T @ dz
        db_ref[l:l + 1, :] += jnp.sum(dz, axis=0, keepdims=True)

        wprev_f = wprev_ref[l].astype(jnp.float32)
        dprev = _dg(dz, wprev_f, 1, 1)               # dz @ wprev^T -> [TT, R]
        # transposed causal shift: dx[s] += dprev[s + d]; rows s >= TT-d come
        # from the LATER tile's dprev head, held in the dz ring
        dbuf[:TT] = dprev
        dbuf[TT:TT + d] = dz_rings[off:off + d]
        shifted = dbuf[d:TT + d]
        dz_rings[off:off + d] = dprev[:d]

        dx = dx + _dg(dz, wcur_ref[l].astype(jnp.float32), 1, 1) + shifted

    dx_ref[0] = dx


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
    exercise the cross-tile ring carry."""
    skip, _ = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res, b_res,
                   w_skip, b_skip)
    return skip


def _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res, b_res, w_skip,
         b_skip):
    B, T, R = x.shape
    TT = tile or pick_tile(cfg, T)
    nT = T // TT
    _, sum_d = _ring_offsets(cfg)
    S = cfg.skip_channels
    wops = _prep_weights(cfg, w_cur, w_prev, b, w_res, b_res, w_skip, b_skip)

    const = lambda *_: (0, 0, 0)
    kernel = functools.partial(_fwd_kernel, cfg, TT)
    skip, snaps = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TT, R), lambda bi, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
             for w in wops],
        out_specs=(
            pl.BlockSpec((1, TT, S), lambda bi, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sum_d, R), lambda bi, j: (bi, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((B, nT, sum_d, R), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((sum_d, R), jnp.bfloat16),
            pltpu.VMEM((cfg.max_dilation + TT, R), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), *wops)
    return skip, snaps


def _vjp_fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res, b_res,
             w_skip, b_skip):
    skip, snaps = _fwd(cfg, interpret, tile, x, w_cur, w_prev, b, w_res,
                       b_res, w_skip, b_skip)
    res = (x, snaps, w_cur, w_prev, b, w_res, b_res, w_skip)
    return skip, res


def _vjp_bwd(cfg, interpret, tile, res, dskip):
    x, snaps, w_cur, w_prev, b, w_res, b_res, w_skip = res
    B, T, R = x.shape
    L = cfg.num_layers
    S = cfg.skip_channels
    TT = tile or pick_tile(cfg, T)
    nT = T // TT
    _, sum_d = _ring_offsets(cfg)
    wops = _prep_weights(cfg, w_cur, w_prev, b, w_res, b_res, w_skip,
                         jnp.zeros((L, S), jnp.float32))[:6]

    const = lambda *_: (0, 0, 0)
    rev = lambda bi, jr: (bi, nT - 1 - jr, 0)
    kernel = functools.partial(_bwd_kernel, cfg, TT, nT)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TT, R), rev, memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((1, 1, sum_d, R),
                         lambda bi, jr: (bi, nT - 1 - jr, 0, 0),
                         memory_space=pltpu.VMEM),                       # snaps
            pl.BlockSpec((1, TT, S), rev, memory_space=pltpu.VMEM),      # dskip
        ] + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
             for w in wops],
        out_specs=(
            pl.BlockSpec((1, TT, R), rev, memory_space=pltpu.VMEM),      # dx
            pl.BlockSpec((L, R, 2 * R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, 2 * R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * R), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, R), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, S), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, R), jnp.float32),
            jax.ShapeDtypeStruct((L, R, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, R, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, R, R), jnp.float32),
            jax.ShapeDtypeStruct((L, R), jnp.float32),
            jax.ShapeDtypeStruct((L, R, S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L + 1, TT, R), jnp.bfloat16),       # xs stash
            pltpu.VMEM((sum_d, R), jnp.float32),            # dz rings (f32)
            pltpu.VMEM((cfg.max_dilation + TT, R), jnp.bfloat16),  # xbuf
            pltpu.VMEM((TT + cfg.max_dilation, R), jnp.float32),   # dbuf
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), snaps, dskip, *wops)
    dx, dwcur, dwprev, db, dwres, dbres, dwskip = outs

    # shapes back to model layout; bskip grad is layer-independent
    dwcur = dwcur.reshape(L, R, 2, R).astype(w_cur.dtype)
    dwprev = dwprev.reshape(L, R, 2, R).astype(w_prev.dtype)
    db = db.reshape(L, 2, R).astype(b.dtype)
    dbskip = jnp.broadcast_to(jnp.sum(dskip, axis=(0, 1)), (L, S)
                              ).astype(b.dtype)
    return (dx.astype(x.dtype), dwcur, dwprev, db,
            dwres.astype(w_res.dtype), dbres.astype(b_res.dtype),
            dwskip.astype(w_skip.dtype), dbskip)


stack_skip_sum.defvjp(_vjp_fwd, _vjp_bwd)


def forward_skip_fused(params, cfg: WaveNetConfig, x: jax.Array,
                       interpret: bool = False, tile=None) -> jax.Array:
    """Embedded input [B, T, R] -> skip-sum [B, T, S] via the fused kernel."""
    return stack_skip_sum(cfg, interpret, tile, x, *_stacked(params))
