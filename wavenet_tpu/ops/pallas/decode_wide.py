"""Pallas TPU kernel: whole-loop AR generation for WIDE-residual models.

The transposed whole-loop kernel (ops/pallas/decode.py) puts the batch on
TPU lanes and channels on sublanes — the right layout for R < 128, but at
R >= 128 Mosaic lane-pads its VMEM-resident ring block to 128 lanes, so the
`full` preset's [4092, 128, Bt] rings cost 134 MiB at ANY batch tile
(measured OOM, round 3) and the flagship config fell back to the XLA scan
at 0.63x realtime (runs/evidence/full_decode/profile.json).

This kernel is the MIRROR layout for wide models (round-3 verdict #1):

  * activations are [Bt, R] — batch on sublanes, CHANNELS on lanes.  R is
    required to be a multiple of 128, so R exactly fills the lane axis and
    nothing pads: the full preset's rings are [4092, Bt, 128] = 1 MiB per
    16-row batch tile instead of 134 MiB;
  * weights are used UNTRANSPOSED ([in, out], the model-param orientation):
    every matmul is x @ W exactly like models/wavenet.py's scan decoder —
    same operand order, same dot products, so the bit-equality contract
    with the scan path holds by construction;
  * ring state lives in HBM (pltpu.ANY) and is DMA'd ONCE into a VMEM
    scratch at launch start and back at launch end — unlike the transposed
    kernel's aliased in/out VMEM blocks, the rings are never double-counted
    against the VMEM budget, which is what lets the full preset's 16.8 MiB
    (Bt=16) of ring state + 9.6 MiB of weights stay resident;
  * sampled tokens accumulate in a [Bt, TC] VMEM buffer via a masked
    select per step (no dynamic lane stores) and DMA out per time chunk,
    so there are no grid-streamed blocks and no 128-divisibility
    constraints on the time chunk;
  * sampling uses the SAME counter RNG as every other decoder
    (ops/rng.py), keyed (per-row seed, global step, class) with the class
    axis on lanes — [Bt, 1] seeds against (Bt, Q) noise, the exact shapes
    decode_sample_chunk uses, so sampled trajectories are bit-identical
    across this kernel, the transposed kernel, the XLA scan, and the
    collective decoder whenever the logits bit-match.

Like the transposed kernel, the whole generation loop — embed, all L gated
residual layers (paper arXiv:1609.03499 eq.2-3), ring reads/writes, head,
Gumbel-max sampling — runs inside one `pallas_call`; weights stay
VMEM-resident across ALL samples and per-sample work is one serialized
pass over the layers with zero dispatch (the BASELINE "queue update kernel
... HBM-bound not dispatch-bound" mandate for the flagship config).

Supports teacher-forced priming (mask-reduce lookup over a VMEM-resident
[Bt, P] prime block), global conditioning (paper eq.2, VMEM-resident
per-layer gate offsets), and mel LOCAL conditioning (paper eq.3): the
upsampled features y stream through the grid as [TC, Bt, M] time blocks
(batch on sublanes, mels on lanes — the mirror of the transposed kernel's
[TC, M, Bt] blocks) and each layer adds y_t @ v_cond[l] on the MXU, so
the flagship-quality vocoder (the `full` stack + MelConfig — the
`full_vocoder` preset) decodes in-kernel instead of falling back to the
XLA scan (round-4 verdict #1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.ops import rng

# Physical-VMEM budget for the plan (weights + ring scratch + working set,
# all counted ONCE — there are no aliased in/out blocks to double-count).
# Hardware-validated 2026-08-19: the full preset's bt=32 plan (44.3 MiB
# accounted) compiles and runs on v5e — one bt=32 launch decodes B=32 at
# 2.08x the rate of two serialized bt=16 launches (1.56M samples/s).
WIDE_VMEM_BUDGET = 48 * 1024 * 1024
VMEM_LIMIT_MARGIN = 2 * 1024 * 1024

# Time chunks below 128 steps crash the v5e remote compiler (TC=64 at the
# full preset -> tpu_compile_helper exit 1, 2026-08-19; the TC=128..512
# plans all compile and run bit-exact).  Hardware launches therefore floor
# the chunk at 128 and PAD the step count instead of shrinking further;
# interpret mode is unaffected (tests use small forced chunks).
TC_MIN_HW = 128


def _ring_offsets(cfg: WaveNetConfig) -> Tuple[Tuple[int, ...], int]:
    offs, acc = [], 0
    for d in cfg.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs), acc


def _pad(n: int, m: int) -> int:
    return -(-n // m) * m


def _tile_bytes(cfg: WaveNetConfig, bt: int, tc: int,
                prime_len: int = 0) -> int:
    """Physical VMEM bytes for one launch (batch tile bt, time chunk tc)."""
    R, S, Q, L = (cfg.residual_channels, cfg.skip_channels,
                  cfg.quantization_channels, cfg.num_layers)
    _, sum_d = _ring_offsets(cfg)
    M = cfg.mel.num_mels if cfg.mel is not None else 0
    bt16 = _pad(bt, 16)                       # bf16 sublane tile
    bt8 = _pad(bt, 8)                         # f32/i32 sublane tile
    b = 2 * sum_d * bt16 * R                  # ring scratch (bf16, once)
    b += 2 * (L * (2 * R * 2 * R + R * R + R * S)     # layer weights bf16
              + S * S + S * Q)                        # head
    b += 4 * 2 * Q * R                        # embed tables (f32: exact
    #   one-hot selection + single rounding, see _decode_kernel.one_hot)
    b += 4 * L * 8 * (2 * R + R + S)          # biases [L, 1->8, X] f32
    b += 4 * 8 * (S + Q)                      # head biases
    b += 4 * bt8 * _pad(tc, 128)              # token buffer i32
    b += 4 * bt8 * 128                        # carry scratch + seeds + init
    b += bt8 * (2 * 4 * R + 4 * 2 * R + 2 * 2 * Q + 4 * Q + 4 * S) * 2
    #   working set: x/h bf16, z f32, one-hots bf16, logits/scores f32,
    #   skip f32 (x2 slack for compiler temporaries)
    if prime_len:
        b += 4 * bt8 * _pad(prime_len, 128)   # forced prime block i32
    if cfg.global_classes is not None:
        b += 4 * L * bt8 * 2 * R              # per-layer gate offsets f32
    if M:
        b += 2 * L * M * 2 * R                # v_cond bf16 (VMEM-resident)
        # grid-STREAMED y blocks [TC, Bt, M] bf16, double-buffered; lanes
        # (mels) pad to the 128-wide register, sublanes (batch) to 16 —
        # same padding rule as the transposed kernel's streamed blocks
        b += 2 * 2 * tc * bt16 * _pad(M, 128)
    return b


def supported(cfg: WaveNetConfig) -> bool:
    """Layout requirement: channels fill whole lanes (R a multiple of 128).
    w_embed_proj (causal_channels != R) configs are excluded for the same
    reason as in decode.plan_tiles: folding the projection into the f32
    tables rounds differently from the scan's bf16 gather+matmul, which
    would break the kernel==scan bit-equality contract."""
    R = cfg.residual_channels
    return (R >= 128 and R % 128 == 0
            and cfg.kernel_size == 2
            and cfg.embed_channels == R)


def plan_tiles(cfg: WaveNetConfig, batch: int,
               tc_hint: int = 512) -> Tuple[int, int]:
    """(batch_tile, time_chunk); (0, 0) when unsupported / over budget.
    Sublane padding makes every bt <= 16 cost the same VMEM, so the largest
    divisor <= 16 wins outright; 32 only when the doubled rings still fit.
    The chunk never plans below TC_MIN_HW (v5e compiler floor)."""
    if not supported(cfg):
        return 0, 0
    tiles = [b for b in (32, 16, 8, 4, 2, 1)
             if b <= batch and batch % b == 0]
    for bt in tiles:
        tc = max(_pad(min(tc_hint, 2048), 8), TC_MIN_HW)
        while tc > TC_MIN_HW and _tile_bytes(cfg, bt, tc) > WIDE_VMEM_BUDGET:
            tc //= 2
        if _tile_bytes(cfg, bt, tc) <= WIDE_VMEM_BUDGET:
            return bt, tc
    return 0, 0


def fits_vmem(cfg: WaveNetConfig, batch: int, prime_len: int = 0) -> bool:
    bt, tc = plan_tiles(cfg, batch)
    if not bt:
        return False
    if prime_len:
        return (_tile_bytes(cfg, bt, tc, prime_len=prime_len)
                <= WIDE_VMEM_BUDGET)
    return True


def _decode_kernel(cfg: WaveNetConfig, TC: int, nTC: int,
                   temperature: float, num_forced: int, has_cond: bool,
                   has_gc: bool, *refs):
    refs = list(refs)
    (seeds_ref, t0_ref, tokens_init_ref, forced_ref,
     ecur_ref, eprev_ref, wcur_ref, wprev_ref, b_ref,
     wres_ref, bres_ref, wskip_ref, bskip_ref,
     hw1_ref, hb1_ref, hw2_ref, hb2_ref) = refs[:17]
    refs = refs[17:]
    y_ref = refs.pop(0) if has_cond else None    # [TC, Bt, M] bf16 blocks
    vcond_ref = refs.pop(0) if has_cond else None  # [L, M, 2R] bf16
    g_ref = refs.pop(0) if has_gc else None      # [L, Bt, 2R] f32 offsets
    (rings_hbm_ref, tokens_out_ref, rings_out_ref, carry_out_ref,
     rings_v, tok_scr, carry_scr, sems) = refs

    R = cfg.residual_channels
    S = cfg.skip_channels
    Q = cfg.quantization_channels
    Bt = tokens_init_ref.shape[0]
    dils = cfg.dilations
    offs, _ = _ring_offsets(cfg)
    j = pl.program_id(0)
    t0 = t0_ref[0] + j * TC

    @pl.when(j == 0)
    def _():
        cp = pltpu.make_async_copy(rings_hbm_ref, rings_v, sems.at[0])
        cp.start()
        cp.wait()
        carry_scr[:, 0:2] = tokens_init_ref[:]

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Q), 1)
    tc_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, TC), 1)
    Pf = forced_ref.shape[1]
    pf_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Pf), 1)

    def one_hot(col):                            # [Bt, 1] i32 -> [Bt, Q] f32
        # f32 one-hot against the f32 tables: the dot is then an EXACT
        # selection (0/1 products, zero partial sums), and the single
        # explicit f32 add + bf16 round below reproduces embed_tokens'
        # x = bf16(E_cur[token] + E_prev[prev]) BIT-EXACTLY.  bf16 tables
        # (pre-round, then add, then round again) differ from the scan on
        # ~37% of (token, prev) pairs by one bf16 ulp — enough to flip
        # greedy argmax at near-ties within ~50 steps (round-4 find; the
        # transposed kernel had the same latent bug).
        return (q_iota == col).astype(jnp.float32)

    def step(t, carry):
        token, prev, tokbuf = carry              # [Bt,1], [Bt,1], [Bt,TC]
        x = (jnp.dot(one_hot(token), ecur_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(one_hot(prev), eprev_ref[:],
                       preferred_element_type=jnp.float32))
        x = x.astype(jnp.bfloat16)               # [Bt, R]
        skip = jnp.zeros((Bt, S), jnp.float32)
        if has_cond:
            y_t = y_ref[t]                       # [Bt, M] bf16

        for l in range(len(dils)):               # static unroll over layers
            d, off = dils[l], offs[l]
            slot = off + jax.lax.rem(t0 + t, d)
            old = rings_v[slot]                  # [Bt, R]
            # separate dots + f32 gate math: the exact formulation of
            # models/wavenet.py decode_step (fusing [x|old] on K would
            # change the MXU accumulation and break scan bit-equality)
            z = (jnp.dot(x, wcur_ref[l], preferred_element_type=jnp.float32)
                 + jnp.dot(old, wprev_ref[l],
                           preferred_element_type=jnp.float32)
                 + b_ref[l])                     # [Bt, 2R] f32 (+[1,2R] bias)
            if has_cond:                         # paper eq.3: V*y into gate
                z = z + jnp.dot(y_t, vcond_ref[l],
                                preferred_element_type=jnp.float32)
            if has_gc:                           # paper eq.2: global offset
                z = z + g_ref[l]
            h = (jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
                 ).astype(jnp.bfloat16)
            skip = (skip
                    + jnp.dot(h, wskip_ref[l],
                              preferred_element_type=jnp.float32)
                    + bskip_ref[l])
            rings_v[slot] = x
            # single-round f32 residual accumulate — the backend-independent
            # recipe shared with the scan and the transposed kernel
            x = (x.astype(jnp.float32)
                 + jnp.dot(h, wres_ref[l], preferred_element_type=jnp.float32)
                 + bres_ref[l]).astype(jnp.bfloat16)

        s = jnp.maximum(skip, 0.0).astype(jnp.bfloat16)
        s = jnp.maximum(
            jnp.dot(s, hw1_ref[:], preferred_element_type=jnp.float32)
            + hb1_ref[:], 0.0).astype(jnp.bfloat16)
        logits = (jnp.dot(s, hw2_ref[:], preferred_element_type=jnp.float32)
                  + hb2_ref[:])                  # [Bt, Q] f32

        if temperature > 0:                      # static: 0 => greedy decode
            gumbel = rng.counter_gumbel(seeds_ref[:], t0 + t, 0, (Bt, Q),
                                        class_axis=1)
            scores = logits * (1.0 / temperature) + gumbel
        else:
            scores = logits
        nxt = jnp.argmax(scores, axis=1, keepdims=True).astype(jnp.int32)

        tokbuf = jnp.where(tc_iota == t, nxt, tokbuf)
        if num_forced > 0:
            # teacher-forced priming: the token CONSUMED at step t+1 comes
            # from the prime while t+1 < num_forced (global steps); the
            # lookup is a masked lane-reduce (no dynamic lane indexing)
            g = t0 + t + 1
            idx = jnp.minimum(g, num_forced - 1)
            forced_col = jnp.sum(
                jnp.where(pf_iota == idx, forced_ref[:], 0),
                axis=1, keepdims=True)
            nxt = jnp.where(g < num_forced, forced_col, nxt)
        return (nxt, token, tokbuf)

    token, prev, tokbuf = jax.lax.fori_loop(
        0, TC, step,
        (carry_scr[:, 0:1], carry_scr[:, 1:2],
         jnp.zeros((Bt, TC), jnp.int32)))
    carry_scr[:, 0:1] = token
    carry_scr[:, 1:2] = prev
    tok_scr[:] = tokbuf
    cp = pltpu.make_async_copy(tok_scr,
                               tokens_out_ref.at[:, pl.ds(j * TC, TC)],
                               sems.at[1])
    cp.start()
    cp.wait()

    @pl.when(j == nTC - 1)
    def _():
        carry_out_ref[:, 0:1] = token
        carry_out_ref[:, 1:2] = prev
        cp = pltpu.make_async_copy(rings_v, rings_out_ref, sems.at[2])
        cp.start()
        cp.wait()


def _flatten_params(params, cfg: WaveNetConfig):
    """Model params (f32, gate axis [L, R, 2, R]) -> kernel operands in the
    UNTRANSPOSED [in, out] orientation (the kernel computes x @ W, exactly
    like the scan decoder); biases as [.., 1, X] f32 rows."""
    L, R = cfg.num_layers, cfg.residual_channels
    bf = jnp.bfloat16

    ecur = params["embed_cur"]
    eprev = params["embed_prev"]
    if "w_embed_proj" in params:
        # excluded by supported(): folding the projection into the f32
        # tables would round differently from the scan.  ValueError (not
        # assert) so a direct kernel caller bypassing the routing gets the
        # contract message even under python -O.
        raise ValueError(
            "causal_channels != residual_channels configs are not servable "
            "by the wide-R decode kernel (w_embed_proj would break the "
            "kernel==scan bit-equality contract); use "
            "models.wavenet.generate")
    row = lambda b: b[..., None, :].astype(jnp.float32)   # [.., X] -> [.., 1, X]
    return (
        # embed tables stay f32: selected exactly by the f32 one-hot dot,
        # summed once, rounded once — bit-identical to embed_tokens
        ecur.astype(jnp.float32), eprev.astype(jnp.float32),  # [Q, R]
        params["w_cur"].reshape(L, R, 2 * R).astype(bf),  # [L, R, 2R]
        params["w_prev"].reshape(L, R, 2 * R).astype(bf),
        row(params["b"].reshape(L, 2 * R)),               # [L, 1, 2R]
        params["w_res"].astype(bf),                       # [L, R, R]
        row(params["b_res"]),                             # [L, 1, R]
        params["w_skip"].astype(bf),                      # [L, R, S]
        row(params["b_skip"]),                            # [L, 1, S]
        params["head_w1"].astype(bf), row(params["head_b1"]),
        params["head_w2"].astype(bf), row(params["head_b2"]),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps",
                                             "temperature", "interpret",
                                             "tc_hint", "force_tiles"))
def decode_chunk(params, cfg: WaveNetConfig, rings: jax.Array,
                 tokens_init: jax.Array, t0: jax.Array, seeds: jax.Array,
                 num_steps: int,
                 temperature: float = 1.0, interpret: bool = False,
                 forced=None, y=None, g=None, tc_hint: int = 128,
                 force_tiles: Optional[Tuple[int, int]] = None):
    """Generate `num_steps` tokens in one wide-kernel launch.

    rings: [sum_d, B, R] bf16 ring state in THIS kernel's layout (zeros at
      start; opaque between calls — note the batch-middle axis order, the
      mirror of decode.py's [sum_d, R, B]).
    tokens_init: [B, 2] int32 — column 0 the token consumed at the first
      step, column 1 the token before it.
    t0: scalar int32 global step of the chunk start (ring phase + RNG key).
    seeds: [B] int32 per-row sampling seeds (ops/rng.py keying).
    y: optional [B, num_steps, M] upsampled conditioning features (cfg.mel)
      — streamed through the grid as [TC, Bt, M] blocks, projected
      in-kernel per layer (paper eq.3).
    g: optional [L, B, 2, R] f32 global-conditioning gate offsets.
    Returns (tokens [B, num_steps] i32, rings', carry [B, 2]).
    """
    B = tokens_init.shape[0]
    _, sum_d = _ring_offsets(cfg)
    R = cfg.residual_channels
    L = cfg.num_layers
    has_cond = y is not None
    has_gc = g is not None
    if has_cond and cfg.mel is None:
        raise ValueError("y passed but cfg.mel is None")
    Bt, TC = force_tiles or plan_tiles(cfg, B, tc_hint)
    if not Bt:
        raise ValueError("config/batch unsupported by the wide-R decode "
                         "kernel; use models.wavenet.generate")
    tc_floor = 8 if interpret else TC_MIN_HW     # v5e compiler floor
    if num_steps % TC:
        ok = [t for t in range(tc_floor, TC + 1, 8) if num_steps % t == 0]
        if num_steps <= TC and num_steps % 8 == 0 and num_steps >= tc_floor:
            TC = num_steps
        elif ok:
            TC = max(ok)
        else:
            raise ValueError(
                f"num_steps={num_steps} has no usable time chunk (floor "
                f"{tc_floor}); pad the step count (generate_wide does this)")
    if TC < tc_floor:
        raise ValueError(f"time chunk {TC} below the hardware floor "
                         f"{TC_MIN_HW} (TC=64 crashes the v5e compiler); "
                         f"pad num_steps to a multiple of {TC_MIN_HW}")
    nTC = num_steps // TC
    nB = B // Bt
    ops = _flatten_params(params, cfg)

    num_forced = 0 if forced is None else forced.shape[1]
    forced_b = (jnp.zeros((B, 1), jnp.int32) if forced is None
                else forced.astype(jnp.int32))
    Pf = forced_b.shape[1]
    kernel = functools.partial(_decode_kernel, cfg, TC, nTC, temperature,
                               num_forced, has_cond, has_gc)

    in_specs = [
        pl.BlockSpec((Bt, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),               # t0
        pl.BlockSpec((Bt, 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, Pf), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs += [pl.BlockSpec(o.shape, (lambda j, nd=o.ndim: (0,) * nd),
                              memory_space=pltpu.VMEM) for o in ops]
    if has_cond:
        M = cfg.mel.num_mels
        # [B, T, M] -> time-leading [T, B, M]; grid streams [TC, Bt, M]
        # blocks (batch on sublanes, mels on lanes) through the pipeline,
        # bf16 like the transposed kernel's y blocks
        y_k = jnp.moveaxis(y, 0, 1).astype(jnp.bfloat16)
        vck = params["v_cond"].reshape(L, M, 2 * R).astype(jnp.bfloat16)
        in_specs += [
            pl.BlockSpec((TC, Bt, M), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vck.shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if has_gc:
        # [L, B, 2, R] -> [L, B, 2R] f32 (tile-sliced below)
        g_k = g.reshape(L, B, 2 * R).astype(jnp.float32)
        in_specs.append(pl.BlockSpec((L, Bt, 2 * R), lambda j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))    # rings (HBM)
    n_in = len(in_specs)

    call = pl.pallas_call(
        kernel,
        grid=(nTC,),
        out_shape=(
            jax.ShapeDtypeStruct((Bt, num_steps), jnp.int32),
            jax.ShapeDtypeStruct((sum_d, Bt, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((Bt, 2), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),            # tokens (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),            # rings (HBM)
            pl.BlockSpec((Bt, 2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={n_in - 1: 1},                  # rings in -> out
        scratch_shapes=[
            pltpu.VMEM((sum_d, Bt, R), jnp.bfloat16),        # ring scratch
            pltpu.VMEM((Bt, TC), jnp.int32),                 # token buffer
            pltpu.VMEM((Bt, 8), jnp.int32),                  # carry scratch
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(_tile_bytes(cfg, Bt, TC, prime_len=num_forced)
                              + VMEM_LIMIT_MARGIN)),
        interpret=interpret,
    )
    seeds_op = rng.as_row_seeds(seeds, B).reshape(B, 1)
    t0_op = jnp.asarray(t0, jnp.int32).reshape(1)
    toks_tiles, rings_tiles, carry_tiles = [], [], []
    for i in range(nB):
        sl = slice(i * Bt, (i + 1) * Bt)
        tile_ops = [seeds_op[sl], t0_op, tokens_init[sl], forced_b[sl],
                    *ops]
        if has_cond:
            tile_ops += [y_k[:, sl], vck]
        if has_gc:
            tile_ops.append(g_k[:, sl])
        tile_ops.append(rings[:, sl])
        tt, rt, ct = call(*tile_ops)
        toks_tiles.append(tt)
        rings_tiles.append(rt)
        carry_tiles.append(ct)
    tokens = (jnp.concatenate(toks_tiles, axis=0) if nB > 1
              else toks_tiles[0])
    rings_out = (jnp.concatenate(rings_tiles, axis=1) if nB > 1
                 else rings_tiles[0])
    carry = (jnp.concatenate(carry_tiles, axis=0) if nB > 1
             else carry_tiles[0])
    return tokens, rings_out, carry


def setup_decode(params, cfg: WaveNetConfig, key, batch: int,
                 num_samples: int, prime_tokens=None, speaker=None,
                 gate_prime: bool = True, seeds=None):
    """Driver prolog mirroring decode.setup_decode (one definition of the
    VMEM gate, global-cond offsets, ring/carry init, seed derivation);
    rings come back in the WIDE layout [sum_d, B, R]."""
    P = 0 if prime_tokens is None else prime_tokens.shape[1]
    if not fits_vmem(cfg, batch, prime_len=P if gate_prime else 0):
        raise ValueError("config/batch/prime unsupported by the wide-R "
                         "decode kernel; use models.wavenet.generate")
    g = None
    if cfg.global_classes is not None:
        if speaker is None:
            raise ValueError("cfg.global_classes set but no speaker ids "
                             "passed")
        from wavenet_tpu.models import wavenet as wn
        g = wn.global_cond_offsets(params, cfg, speaker)     # [L, B, 2, R]
    _, sum_d = _ring_offsets(cfg)
    rings = jnp.zeros((sum_d, batch, cfg.residual_channels), jnp.bfloat16)
    if P:
        first = prime_tokens[:, 0:1].astype(jnp.int32)
    else:
        first = jnp.full((batch, 1), cfg.quantization_channels // 2,
                         jnp.int32)
    carry = jnp.concatenate([first, jnp.zeros((batch, 1), jnp.int32)],
                            axis=1)
    if seeds is None:
        seeds = jax.random.randint(key, (), 0, 2 ** 31 - 1)
    seeds = rng.as_row_seeds(seeds, batch)
    return rings, carry, seeds, g, P, max(P - 1, 0) + num_samples


def generate_wide(params, cfg: WaveNetConfig, key,
                  num_samples: int, batch: int = 1,
                  prime_tokens=None, y=None, speaker=None,
                  temperature: float = 1.0,
                  chunk: int = 512, interpret: bool = False,
                  force_tiles: Optional[Tuple[int, int]] = None,
                  seeds=None) -> jax.Array:
    """Fast generation for wide-R models via the channels-on-lanes kernel.
    Same contract as decode.generate_pallas (priming, local mel
    conditioning via y [B, T>=steps, M] upsampled features, global
    conditioning, per-row seeds, greedy at temperature 0); callers should
    check fits_vmem() and fall back to models.wavenet.generate otherwise."""
    rings, carry, seed, g, P, total = setup_decode(
        params, cfg, key, batch, num_samples, prime_tokens, speaker,
        gate_prime=force_tiles is None, seeds=seeds)
    Bt, TC = force_tiles or plan_tiles(cfg, batch, min(chunk, 2048))
    tc_floor = 8 if interpret else TC_MIN_HW
    while TC > tc_floor and TC > total:
        TC //= 2
    TC = max(TC // 8 * 8, tc_floor)
    total_pad = -(-total // TC) * TC
    if y is not None:
        if y.shape[1] < total:
            raise ValueError(f"y covers {y.shape[1]} < {total} steps "
                             f"(priming included)")
        y = jnp.pad(y[:, :total],
                    ((0, 0), (0, total_pad - total), (0, 0)))
    toks, _, _ = decode_chunk(params, cfg, rings, carry, jnp.int32(0), seed,
                              total_pad, temperature, interpret=interpret,
                              forced=prime_tokens, y=y, g=g,
                              force_tiles=(Bt, TC))
    return toks[:, max(P - 1, 0):total]
