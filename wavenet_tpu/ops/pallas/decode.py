"""Pallas TPU kernel: the ENTIRE autoregressive generation loop in one kernel.

This is the BASELINE-mandated fast-generation kernel ("the fast-generation
queue update kernel makes per-sample decode latency HBM-bound rather than
dispatch-bound").  It goes beyond fusing the queue update: the whole
generate() loop — embed, all L gated residual layers, ring-buffer reads/
writes, local conditioning, the softmax head, and Gumbel-max categorical
sampling — runs inside a single `pallas_call`:

  * weights stay VMEM-resident across ALL generated samples (the XLA scan
    path re-streams them from HBM every step);
  * ring buffers use a COMPACT layout [sum(dilations), R, B] (vs the XLA
    path's [L, B, maxd, R]) — each layer's ring is exactly its dilation long,
    indexed at t mod d with static per-layer offsets.  The ring axis leads so
    every access is a leading-axis dynamic index (Mosaic lowers middle-axis
    stores of reshaped vectors poorly);
  * batch tiles as SEPARATE kernel launches inside one jit (Mosaic rejects
    lane-axis blocks that are neither 128-divisible nor the full dim, so
    batch CANNOT tile on the pallas grid); each launch's rings + working set
    fit VMEM so any batch size runs in-kernel — round-1 capped out at B=32.
    The TIME axis is the pallas grid: it streams per-chunk blocks (sampled-
    token output and, when conditioning, the upsampled mel features) through
    Pallas' double-buffered pipeline, so sample count is not VMEM-bound;
  * local conditioning (WaveNet paper eq.3) runs IN-KERNEL: the upsampled
    features y stream in as [TC, M, Bt] time blocks and each layer adds
    v_cond[l] @ y_t on the MXU — the conditional vocoder (BASELINE config 5)
    decodes without falling back to the XLA scan;
  * sampling uses an in-kernel counter-based RNG with the Gumbel-max trick
    (ops/rng.py — ONE hash shared with the collective decoder and the XLA
    scan's counter-sampling mode), keyed by (per-ROW seed, global step,
    class) — identical on TPU and in interpret mode, independent of the
    batch tiling, of co-batched rows, and of any mesh layout.

Interface mirrors models/wavenet.py's decoder; equivalence is tested against
it (tests/test_pallas_decode.py) in interpret mode on CPU and compiled on
TPU.

Everything runs TRANSPOSED: activations are [channels, batch_tile] so the
batch lives on TPU lanes and channels on sublanes; every dynamic store is a
LEADING-axis index and the sampled token is a [1, Bt] row (argmax over the
sublane axis) — no in-kernel transposes exist at all.
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

# conservative per-core VMEM budget (v5e has ~16MB; headroom for padding)
# Per-launch scoped-VMEM ceiling for the decode kernel's tile plan.  The
# compiler's scoped accounting matches _tile_bytes (it counts the aliased
# rings input AND output blocks, even though they share one physical buffer
# at runtime), and a 34.4 MiB-accounted plan (bt=64, tc=1024, fastgen B=64)
# compiles and runs BIT-EXACT on v5e — hardware-swept 2026-08-19
# (tools/tpu_decode_sweep.py): one bt=64 launch decodes B=64 at ~114k
# steps/s with readback vs ~27k for the old four serialized bt=16 launches.
# The limit passed to each pallas_call is sized to ITS plan (+margin), not
# to this ceiling: a small plan under a much larger vmem limit crashes the
# v5e compiler (bt=16 under a 42 MiB limit -> tpu_compile_helper exit 1,
# reproducible), so blanket-raising the limit is not an option.
VMEM_BUDGET = 35 * 1024 * 1024
VMEM_LIMIT_MARGIN = 2 * 1024 * 1024


def _ring_offsets(cfg: WaveNetConfig) -> Tuple[Tuple[int, ...], int]:
    offs, acc = [], 0
    for d in cfg.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs), acc


def _tile_bytes(cfg: WaveNetConfig, bt: int, tc: int) -> int:
    """VMEM bytes for one (batch_tile, time_chunk) grid step."""
    R, S, Q, L = (cfg.residual_channels, cfg.skip_channels,
                  cfg.quantization_channels, cfg.num_layers)
    _, sum_d = _ring_offsets(cfg)
    M = cfg.mel.num_mels if cfg.mel is not None else 0
    # VMEM-RESIDENT ring blocks: for R < 128 Mosaic packs [sum_d, R, Bt]
    # without padding the Bt lane axis (hardware-proven: fastgen R=64 runs
    # at bt=16/32/64 with tile accounting that matches the compiler's), but
    # at R >= 128 it lane-pads Bt to the full 128 — the `full` preset's
    # [4092, 128, Bt] ring block costs 134 MiB at ANY Bt (measured OOM:
    # "Used 265.74M of 128.00M vmem", in+out both counted), so wide-R
    # models can only decode in-kernel when sum_d is small enough to absorb
    # the padding; `full` itself falls back to the XLA scan (or the wide-R
    # kernel, ops/pallas/decode_wide.py).  Lane padding rounds UP — it never
    # caps — so a bt > 128 tile keeps its true lane count.
    ring_bt = max(bt, 128) if R >= 128 else bt
    b = 4 * 2 * Q * R                            # embed tables (f32: exact
    #   one-hot selection + single rounding, see _decode_kernel.one_hot)
    b += 2 * (
        L * (2 * R * 2 * R + R * R + R * S)      # layer weights
        + S * S + S * Q                          # head
        + 2 * ring_bt * sum_d * R                # ring tile: the aliasing is
        #   HBM-only — the input block and the output block are BOTH live in
        #   VMEM (the kernel copies rings_in -> rings at j == 0)
        + bt * (4 * R + S + 4 * Q)               # working set
    )
    # Grid-STREAMED time blocks are lane-padded to the full 128-lane register
    # width whatever Bt is (measured on v5e: the mel decode's scoped-VMEM OOM
    # is exactly 2 * tc * M * 128 * 2B at every Bt in 1..8 and every tc —
    # 80 MiB at tc=2048, 40 at 1024, 20 at 512), so their cost is counted at
    # 128 lanes.  VMEM-RESIDENT refs (rings, weights, working set) are not
    # padded this way (bt=16 fastgen runs 10 MiB-accounted under a 14 MiB
    # limit), so those keep the true Bt.
    bt_pad = max(bt, 128)
    b += 2 * 4 * tc * bt_pad                     # token block (dbl-buffered)
    if M:
        b += 2 * L * 2 * R * M                   # v_cond
        b += 2 * 2 * tc * M * bt_pad             # y block (dbl-buffered)
    if cfg.global_classes is not None:
        b += 4 * L * 2 * R * bt                  # global gate offsets (f32)
    return b


def plan_tiles(cfg: WaveNetConfig, batch: int,
               tc_hint: int = 2048) -> Tuple[int, int]:
    """(batch_tile, time_chunk) for the grid; (0, 0) when nothing fits.
    Largest batch tile first (lane occupancy), then the largest time chunk
    (grid/pipeline amortization) that keeps the step under budget."""
    if cfg.embed_channels != cfg.residual_channels:
        # w_embed_proj configs: the kernel folds the projection into the
        # f32 embed tables (one rounding), the scan matmuls in bf16 after
        # a bf16 add (three) — trajectories would diverge at near-ties,
        # breaking the kernel==scan bit-equality contract.  No preset uses
        # causal_channels != R; route such configs to the scan.
        return 0, 0
    if cfg.kernel_size != 2:
        # the kernel's rings/taps are contractually width-2 (every preset);
        # wider kernels decode on the XLA scan
        return 0, 0
    tiles = [b for b in (256, 128, 64, 48, 32, 24, 16, 8, 4, 2, 1)
             if b <= batch and batch % b == 0]
    for bt in tiles:
        tc = max(min(tc_hint, 2048) // 8 * 8, 8)   # Mosaic: blocks % 8 == 0
        while tc > 8 and _tile_bytes(cfg, bt, tc) > VMEM_BUDGET:
            tc = max(tc // 2 // 8 * 8, 8)          # lane occupancy (bt)
            #   beats time-chunk size: explore down to the floor before
            #   abandoning this batch tile
        if _tile_bytes(cfg, bt, tc) <= VMEM_BUDGET:
            return bt, tc
    return 0, 0


def fits_vmem(cfg: WaveNetConfig, batch: int, prime_len: int = 0) -> bool:
    """True when the whole-loop kernel can serve (cfg, batch) — with batch
    tiling and time streaming this now covers large batches AND the
    conditional vocoder (round 1 required cfg.mel is None and B <= 32).

    prime_len: teacher-forced prime length; the forced token block
    [prime_len, Bt] int32 stays VMEM-resident for the launch, so very long
    primes must fall back to the scan decoder."""
    bt, tc = plan_tiles(cfg, batch)
    if not bt:
        return False
    if prime_len:
        return _tile_bytes(cfg, bt, tc) + 4 * prime_len * bt <= VMEM_BUDGET
    return True


def shrink_tc(tc: int, want: int) -> int:
    """Shrink a planned time chunk toward `want` steps, keeping it a
    multiple of 8 (Mosaic requires time blocks divisible by 8) with floor
    8.  Shared by the one-shot and streaming drivers so the lowering
    constraint lives in one place."""
    while tc > 8 and tc > want:
        tc //= 2
    return max(tc // 8 * 8, 8)


def _decode_kernel(cfg: WaveNetConfig, TC: int, nTC: int,
                   temperature: float, num_forced: int, has_cond: bool,
                   has_gc: bool, *refs):
    refs = list(refs)
    (seeds_ref, t0_ref, tokens_init_ref, forced_ref,
     ecur_ref, eprev_ref, wcur_ref, wprev_ref, b_ref,
     wres_ref, bres_ref, wskip_ref, bskip_ref,
     hw1_ref, hb1_ref, hw2_ref, hb2_ref) = refs[:17]
    refs = refs[17:]
    y_ref = refs.pop(0) if has_cond else None
    vcond_ref = refs.pop(0) if has_cond else None
    g_ref = refs.pop(0) if has_gc else None      # [L, 2R, Bt] f32 offsets
    (rings_in_ref, tokens_out_ref, rings_ref, carry_out_ref,
     carry_scr) = refs
    R = cfg.residual_channels
    S = cfg.skip_channels
    Q = cfg.quantization_channels
    Bt = tokens_init_ref.shape[1]
    dils = cfg.dilations
    offs, _ = _ring_offsets(cfg)
    j = pl.program_id(0)                         # time-chunk grid only
    t0 = t0_ref[0] + j * TC                      # global step of this block

    @pl.when(j == 0)                             # first chunk of this launch
    def _():
        rings_ref[:] = rings_in_ref[:]
        carry_scr[0:2, :] = tokens_init_ref[0:2, :]

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, Bt), 0)

    def one_hot(tok_row):                        # [1, Bt] i32 -> [Q, Bt] f32
        # f32 one-hot against f32 tables: the dot is an EXACT selection, so
        # the explicit f32 add + single bf16 round below reproduces
        # embed_tokens bit-exactly.  The round-1..3 bf16 tables pre-rounded
        # each entry and re-rounded the sum — one bf16 ulp off the scan on
        # ~37% of (token, prev) pairs, which flipped greedy argmax at
        # near-ties on LONG runs (first divergence ~step 100 on a random
        # small config; round-4 find, tests/test_pallas_decode.py long
        # greedy case).
        return (q_iota == tok_row).astype(jnp.float32)

    def step(t, carry):
        token, prev = carry                      # each [1, Bt] int32
        x = (jnp.dot(ecur_ref[:], one_hot(token),
                     preferred_element_type=jnp.float32)
             + jnp.dot(eprev_ref[:], one_hot(prev),
                       preferred_element_type=jnp.float32))
        x = x.astype(jnp.bfloat16)               # [R, Bt]
        skip = jnp.zeros((S, Bt), jnp.float32)
        if has_cond:
            y_t = y_ref[t].astype(jnp.bfloat16)  # [M, Bt]

        for l in range(len(dils)):               # static unroll over layers
            d, off = dils[l], offs[l]
            slot = off + jax.lax.rem(t0 + t, d)
            old = rings_ref[slot]                            # [R, Bt]
            # f32 gate math to match models/wavenet.py (_layer_step): XLA
            # compiles the scan path with excess precision on TPU, so the
            # kernel must NOT round z to bf16
            z = (jnp.dot(wcur_ref[l], x, preferred_element_type=jnp.float32)
                 + jnp.dot(wprev_ref[l], old,
                           preferred_element_type=jnp.float32)
                 + b_ref[l])                     # [2R, Bt] f32 (+[2R,1] bias)
            if has_cond:                         # paper eq.3: V*y into gate
                z = z + jnp.dot(vcond_ref[l], y_t,
                                preferred_element_type=jnp.float32)
            if has_gc:                           # paper eq.2: global offset
                z = z + g_ref[l]
            h = (jnp.tanh(z[:R, :]) * jax.nn.sigmoid(z[R:, :])
                 ).astype(jnp.bfloat16)
            skip = (skip
                    + jnp.dot(wskip_ref[l], h,
                              preferred_element_type=jnp.float32)
                    + bskip_ref[l])
            rings_ref[slot] = x
            # residual update with ONE f32 accumulate + ONE rounding — the
            # only backend-independent recipe (models/wavenet._layer_step
            # uses the identical form).  A bare bf16 add lowers to a NATIVE
            # bf16 add under Mosaic while XLA applies excess precision; any
            # intermediate bf16 round is elided by XLA-TPU but kept by
            # XLA-CPU and Mosaic.  The 1-ulp gaps cascaded into greedy
            # token divergence within 6 steps (tools/tpu_verify.py).
            x = (x.astype(jnp.float32)
                 + jnp.dot(wres_ref[l], h,
                           preferred_element_type=jnp.float32)
                 + bres_ref[l]).astype(jnp.bfloat16)

        s = jnp.maximum(skip, 0.0).astype(jnp.bfloat16)
        s = jnp.maximum(
            jnp.dot(hw1_ref[:], s, preferred_element_type=jnp.float32)
            + hb1_ref[:], 0.0).astype(jnp.bfloat16)
        logits = (jnp.dot(hw2_ref[:], s, preferred_element_type=jnp.float32)
                  + hb2_ref[:])                  # [Q, Bt] f32

        if temperature > 0:                      # static: 0 => greedy decode
            # per-ROW seeds ([1, Bt] row, broadcast over the class sublanes)
            # via the shared counter RNG — plain VPU integer ops, identical
            # compiled on TPU and in interpret mode (ops/rng.py)
            gumbel = rng.counter_gumbel(seeds_ref[:], t0 + t, 0, (Q, Bt),
                                        class_axis=0)
            scores = logits * (1.0 / temperature) + gumbel
        else:
            scores = logits
        nxt = jnp.argmax(scores, axis=0, keepdims=True).astype(jnp.int32)

        tokens_out_ref[pl.ds(t, 1), :] = nxt     # [1, Bt] row store
        if num_forced > 0:
            # teacher-forced priming: the token CONSUMED at step t+1 comes
            # from the prime sequence while t+1 < num_forced (global steps)
            g = t0 + t + 1
            idx = jnp.minimum(g, num_forced - 1)
            forced_row = forced_ref[pl.ds(idx, 1), :]
            nxt = jnp.where(g < num_forced, forced_row, nxt)
        return (nxt, token)

    token, prev = jax.lax.fori_loop(
        0, TC, step, (carry_scr[0:1, :], carry_scr[1:2, :]))
    carry_scr[0:1, :] = token
    carry_scr[1:2, :] = prev

    @pl.when(j == nTC - 1)
    def _():
        carry_out_ref[0:1, :] = token
        carry_out_ref[1:2, :] = prev


def _flatten_params(params, cfg: WaveNetConfig):
    """Model params (f32, gate axis [L,R,2,R]) -> TRANSPOSED kernel operands:
    weight matrices as [out, in] bf16 so the kernel computes W @ x with
    x = [channels, batch]; biases as [out, 1] f32 columns."""
    L, R = cfg.num_layers, cfg.residual_channels
    bf = jnp.bfloat16

    def fuse_t(w):   # [L, R, 2, R] -> [L, 2R, R]
        return jnp.swapaxes(w.reshape(L, R, 2 * R), 1, 2)

    ecur = params["embed_cur"]
    eprev = params["embed_prev"]
    if "w_embed_proj" in params:
        # excluded by plan_tiles: folding the projection into the f32
        # tables would round differently from the scan.  ValueError (not
        # assert) so a direct decode_chunk caller bypassing the routing
        # gets the contract message even under python -O.
        raise ValueError(
            "causal_channels != residual_channels configs are not servable "
            "by the whole-loop decode kernel (w_embed_proj would break the "
            "kernel==scan bit-equality contract); use "
            "models.wavenet.generate")
    col = lambda b: b[..., None].astype(jnp.float32)          # [..., X] -> [..., X, 1]
    return (
        # embed tables stay f32: selected exactly by the f32 one-hot dot,
        # summed once, rounded once — bit-identical to embed_tokens (see
        # _decode_kernel.one_hot)
        ecur.T.astype(jnp.float32), eprev.T.astype(jnp.float32),  # [R, Q]
        fuse_t(params["w_cur"]).astype(bf),                   # [L, 2R, R]
        fuse_t(params["w_prev"]).astype(bf),
        params["b"].reshape(L, 2 * R)[..., None].astype(jnp.float32),
        jnp.swapaxes(params["w_res"], 1, 2).astype(bf),       # [L, R, R]
        params["b_res"][..., None].astype(jnp.float32),       # [L, R, 1]
        jnp.swapaxes(params["w_skip"], 1, 2).astype(bf),      # [L, S, R]
        col(params["b_skip"]),                                # [L, S, 1]
        params["head_w1"].T.astype(bf), col(params["head_b1"]),
        params["head_w2"].T.astype(bf), col(params["head_b2"]),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps",
                                             "temperature", "interpret",
                                             "tc_hint", "force_tiles"))
def decode_chunk(params, cfg: WaveNetConfig, rings: jax.Array,
                 tokens_init: jax.Array, t0: jax.Array, seeds: jax.Array,
                 num_steps: int,
                 temperature: float = 1.0, interpret: bool = False,
                 forced=None, y=None, g=None, tc_hint: int = 2048,
                 force_tiles: Optional[Tuple[int, int]] = None):
    """Generate `num_steps` tokens in one kernel launch over the
    (batch_tiles, time_chunks) grid.

    rings: [sum_d, R, B] bf16 ring state in kernel layout (zeros at start;
      treat as opaque between calls).
    tokens_init: [B, 2] int32 — column 0 the token consumed at the first
      step, column 1 the token before it (0 at sequence start).
    t0: scalar int32 global step index of the chunk start (ring phase).
    seeds: [B] int32 PER-ROW sampling seeds (ops/rng.py keying; a scalar
      is expanded via rng.as_row_seeds).
    y: optional [B, num_steps, M] upsampled conditioning features (cfg.mel).
    g: optional [L, B, 2, R] f32 global-conditioning gate offsets
      (models.wavenet.global_cond_offsets) — time-constant, held VMEM-
      resident across all steps.
    Returns (tokens [B, num_steps] i32, rings', carry [B, 2]) where carry is
    the tokens_init for the next call (pass t0 + num_steps with it).
    """
    B = tokens_init.shape[0]
    _, sum_d = _ring_offsets(cfg)
    R = cfg.residual_channels
    has_cond = y is not None
    has_gc = g is not None
    if has_cond and cfg.mel is None:
        raise ValueError("y passed but cfg.mel is None")
    Bt, TC = force_tiles or plan_tiles(cfg, B, tc_hint)
    if not Bt:
        raise ValueError("model too large for the VMEM-resident decode "
                         "kernel; use models.wavenet.generate")
    if num_steps % TC:
        # Mosaic requires the time-block dim divisible by 8 (or the whole
        # array): only such divisors are usable.  35999 total steps (prime)
        # from a primed generate once landed here and produced TC=1.
        ok = [t for t in range(8, TC + 1, 8) if num_steps % t == 0]
        if num_steps <= TC:
            TC = num_steps
        elif ok:
            TC = max(ok)
        else:
            raise ValueError(
                f"num_steps={num_steps} has no time-chunk divisible by 8; "
                f"pad the step count (generate_pallas does this)")
    nB, nTC = B // Bt, num_steps // TC
    ops = _flatten_params(params, cfg)

    num_forced = 0 if forced is None else forced.shape[1]
    forced_t = (jnp.zeros((1, B), jnp.int32) if forced is None
                else forced.T.astype(jnp.int32))
    Pf = forced_t.shape[0]
    kernel = functools.partial(_decode_kernel, cfg, TC, nTC, temperature,
                               num_forced, has_cond, has_gc)

    # Batch tiles are SEPARATE launches: Mosaic requires lane-axis blocks to
    # be 128-divisible or the whole dim, so (X, B)->(X, Bt) grid blocking
    # cannot lower whenever Bt < B (bisected on hardware at B=64/Bt=32).
    # Each launch sees its full [*, Bt] tile; the per-ROW seeds slice with
    # the tile, so the counter RNG draws tile-independent noise.
    full = lambda j: (0, 0)
    in_specs = [
        pl.BlockSpec((1, Bt), full, memory_space=pltpu.VMEM),  # row seeds
        pl.BlockSpec(memory_space=pltpu.SMEM),               # t0
        pl.BlockSpec((2, Bt), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((Pf, Bt), full, memory_space=pltpu.VMEM),
    ]
    in_specs += [pl.BlockSpec(o.shape, (lambda j, nd=o.ndim: (0,) * nd),
                              memory_space=pltpu.VMEM) for o in ops]
    if has_cond:
        M = cfg.mel.num_mels
        y_k = jnp.moveaxis(y, 0, 2).astype(jnp.bfloat16)     # [T, M, B]
        vck = jnp.swapaxes(params["v_cond"].reshape(
            cfg.num_layers, M, 2 * R), 1, 2).astype(jnp.bfloat16)
        in_specs += [
            pl.BlockSpec((TC, M, Bt), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vck.shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if has_gc:
        L = cfg.num_layers
        # [L, B, 2, R] -> kernel layout [L, 2R, B] (transposed, like z)
        g_k = jnp.moveaxis(g.reshape(L, B, 2 * R), 1, 2
                           ).astype(jnp.float32)
        in_specs.append(pl.BlockSpec((L, 2 * R, Bt), lambda j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((sum_d, R, Bt), lambda j: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    n_in = len(in_specs)

    call = pl.pallas_call(
        kernel,
        grid=(nTC,),
        out_shape=(
            jax.ShapeDtypeStruct((num_steps, Bt), jnp.int32),
            jax.ShapeDtypeStruct((sum_d, R, Bt), jnp.bfloat16),
            jax.ShapeDtypeStruct((2, Bt), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((TC, Bt), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sum_d, R, Bt), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt), full, memory_space=pltpu.VMEM),
        ),
        input_output_aliases={n_in - 1: 1},                  # rings in -> out
        scratch_shapes=[pltpu.VMEM((8, Bt), jnp.int32)],     # token carry
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # sized to THIS plan (incl. the VMEM-resident forced-prime
            # block, which fits_vmem also accounts): see the VMEM_BUDGET
            # note — a small plan under a much larger limit crashes the
            # v5e compiler
            vmem_limit_bytes=(_tile_bytes(cfg, Bt, TC) + 4 * Pf * Bt
                              + VMEM_LIMIT_MARGIN)),
        interpret=interpret,
    )
    seeds_op = rng.as_row_seeds(seeds, B).reshape(1, B)
    t0_op = jnp.asarray(t0, jnp.int32).reshape(1)
    ti_t = tokens_init.T
    toks_tiles, rings_tiles, carry_tiles = [], [], []
    for i in range(nB):
        sl = slice(i * Bt, (i + 1) * Bt)
        tile_ops = [seeds_op[:, sl], t0_op,
                    ti_t[:, sl], forced_t[:, sl], *ops]
        if has_cond:
            tile_ops += [y_k[:, :, sl], vck]
        if has_gc:
            tile_ops.append(g_k[:, :, sl])
        tile_ops.append(rings[:, :, sl])
        tt, rt, ct = call(*tile_ops)
        toks_tiles.append(tt)
        rings_tiles.append(rt)
        carry_tiles.append(ct)
    tokens_t = jnp.concatenate(toks_tiles, axis=1) if nB > 1 else toks_tiles[0]
    rings_out = (jnp.concatenate(rings_tiles, axis=2) if nB > 1
                 else rings_tiles[0])
    carry_t = (jnp.concatenate(carry_tiles, axis=1) if nB > 1
               else carry_tiles[0])
    return tokens_t.T, rings_out, carry_t.T


def setup_decode(params, cfg: WaveNetConfig, key, batch: int,
                 num_samples: int, prime_tokens=None, speaker=None,
                 gate_prime: bool = True, seeds=None):
    """Shared driver prolog for the one-shot AND streaming decoders — one
    definition of the VMEM gate (incl. the prime block), the
    global-conditioning offsets, ring/carry init, seed derivation, and step
    accounting, so the two drivers cannot drift apart (their outputs are
    contractually bit-identical).  Returns (rings, carry, seeds, g, P,
    total) with total = max(P-1, 0) + num_samples.

    seeds: optional per-row sampling seeds (int scalar or [batch] int32,
    ops/rng.py keying) — e.g. the serving layer's per-REQUEST seeds, which
    make each row's audio independent of co-batched traffic.  None derives
    them from `key`."""
    P = 0 if prime_tokens is None else prime_tokens.shape[1]
    if not fits_vmem(cfg, batch, prime_len=P if gate_prime else 0):
        raise ValueError("model/batch/prime too large for the VMEM-resident "
                         "decode kernel; use models.wavenet.generate")
    g = None
    if cfg.global_classes is not None:
        if speaker is None:
            raise ValueError("cfg.global_classes set but no speaker ids "
                             "passed")
        from wavenet_tpu.models import wavenet as wn
        g = wn.global_cond_offsets(params, cfg, speaker)     # [L, B, 2, R]
    _, sum_d = _ring_offsets(cfg)
    rings = jnp.zeros((sum_d, cfg.residual_channels, batch), jnp.bfloat16)
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


def generate_pallas(params, cfg: WaveNetConfig, key,
                    num_samples: int, batch: int = 1,
                    prime_tokens=None, y=None, speaker=None,
                    temperature: float = 1.0,
                    chunk: int = 2048, interpret: bool = False,
                    force_tiles: Optional[Tuple[int, int]] = None,
                    seeds=None) -> jax.Array:
    """Drop-in fast generation via the whole-loop kernel.  Supports
    teacher-forced priming (prime_tokens [B, P]), local conditioning
    (y [B, T>=steps, M] upsampled mel features), and global conditioning
    (speaker [B] int32 class ids, cfg.global_classes set); callers should
    check fits_vmem() and fall back to models.wavenet.generate otherwise.
    `chunk` is the time-grid block hint (compile-relevant only);
    `force_tiles` overrides the (batch_tile, time_chunk) plan (tests);
    `seeds` = per-row sampling seeds overriding `key` (setup_decode)."""
    rings, carry, seed, g, P, total = setup_decode(
        params, cfg, key, batch, num_samples, prime_tokens, speaker,
        gate_prime=force_tiles is None, seeds=seeds)
    # total: P-1 priming steps consume prime[1:], then num_samples
    # free-running steps; outputs before the first free sample are dropped.
    # Round UP to a whole number of time chunks (the surplus free-running
    # tail is discarded) — shrinking the chunk to a divisor instead can
    # reach unlowerable sizes when the total is prime-ish.
    Bt, TC = force_tiles or plan_tiles(cfg, batch, min(chunk, 2048))
    # shrink the chunk toward the total (never below 8, multiple of 8) so
    # short requests don't pad to a full 2048-step chunk
    TC = shrink_tc(TC, total)
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
                              tc_hint=min(chunk, 2048),
                              force_tiles=(Bt, TC))
    return toks[:, max(P - 1, 0):total]
