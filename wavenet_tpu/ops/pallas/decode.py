"""Pallas TPU kernel: the ENTIRE autoregressive generation loop in one kernel.

This is the BASELINE-mandated fast-generation kernel ("the fast-generation
queue update kernel makes per-sample decode latency HBM-bound rather than
dispatch-bound").  It goes beyond fusing the queue update: the whole
generate() loop — embed, all L gated residual layers, ring-buffer reads/
writes, the softmax head, and Gumbel-max categorical sampling — runs inside
a single `pallas_call`, so per-sample cost is pure VPU/MXU work:

  * weights stay VMEM-resident across ALL generated samples (the XLA scan
    path re-streams them from HBM every step);
  * ring buffers use a COMPACT layout [sum(dilations), B, R] (vs the XLA
    path's [L, B, maxd, R]) — each layer's ring is exactly its dilation long,
    indexed at t mod d with static per-layer offsets.  The ring axis leads so
    every access is a leading-axis dynamic index (Mosaic lowers middle-axis
    stores of reshaped vectors poorly);
  * sampling uses an in-kernel counter-based RNG with the Gumbel-max trick
    (plain VPU integer ops -> identical on TPU and in interpret mode), so no
    host RNG round-trips.

Interface mirrors models/wavenet.py's decoder; equivalence is tested against
it (tests/test_pallas_decode.py) in interpret mode on CPU and compiled on
TPU.  Local conditioning and priming run through the XLA path for now; this
kernel serves the unconditional fast-generation benchmark config.

VMEM budget: weights ~= L*(2*R*2R + R*R + R*S)*2B + embeds + head; rings
B*sum_d*R*2B.  `fits_vmem()` checks the budget and callers fall back to the
XLA scan decoder when it does not fit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.config import WaveNetConfig

# conservative per-core VMEM budget (v5e has ~16MB; headroom for padding)
VMEM_BUDGET = 12 * 1024 * 1024


def _ring_offsets(cfg: WaveNetConfig) -> Tuple[Tuple[int, ...], int]:
    offs, acc = [], 0
    for d in cfg.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs), acc


def fits_vmem(cfg: WaveNetConfig, batch: int, num_steps: int = 2048) -> bool:
    R, S, Q, L = (cfg.residual_channels, cfg.skip_channels,
                  cfg.quantization_channels, cfg.num_layers)
    _, sum_d = _ring_offsets(cfg)
    bytes_ = 2 * (
        L * (2 * R * 2 * R + R * R + R * S)      # layer weights
        + 2 * Q * R + S * S + S * Q              # embeds + head
        + batch * sum_d * R                      # rings
        + batch * (4 * R + S + 4 * Q)            # working set
    ) + 4 * batch * num_steps                    # token output
    return bytes_ < VMEM_BUDGET and cfg.mel is None


def _mix(h):
    """murmur3 finalizer: full avalanche on 32-bit lanes."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _counter_rng_uniform(seed, t, shape):
    """Counter-based RNG: uniform f32 in (0,1) from (seed, step, lane index).

    Plain VPU integer ops, so it runs identically compiled on TPU and in
    interpret mode on CPU (pltpu.prng_* has no CPU lowering).  Two murmur
    finalizer rounds over a 32-bit counter give full avalanche — ample for
    drawing from a 256-way softmax."""
    idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(shape[1])
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    h = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + t.astype(jnp.uint32) * jnp.uint32(0x7F4A7C15) + idx)
    bits = _mix(_mix(h) + idx)
    # (bits >> 8) fits in 24 bits, so the int32 round-trip is exact; Mosaic
    # has no direct uint32 -> float32 cast
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * (1.0 / (1 << 24)) + 1e-12)


def _decode_kernel(cfg: WaveNetConfig, num_steps: int, temperature: float,
                   num_forced: int,
                   # inputs:
                   seed_ref, t0_ref, tokens_init_ref, forced_ref,
                   ecur_ref, eprev_ref,
                   wcur_ref, wprev_ref, b_ref,
                   wres_ref, bres_ref, wskip_ref, bskip_ref,
                   hw1_ref, hb1_ref, hw2_ref, hb2_ref,
                   rings_in_ref,
                   # outputs:
                   tokens_out_ref, rings_ref, carry_out_ref,
                   ):
    """Everything runs TRANSPOSED: activations are [channels, batch] so the
    batch lives on TPU lanes and channels on sublanes.  This makes every
    dynamic store a LEADING-axis index (ring slots, per-step token rows) —
    the layouts Mosaic lowers well — and the sampled token is naturally a
    [1, B] row (argmax over the sublane axis), so no in-kernel transposes
    exist at all."""
    R = cfg.residual_channels
    S = cfg.skip_channels
    Q = cfg.quantization_channels
    B = tokens_init_ref.shape[1]
    dils = cfg.dilations
    offs, _ = _ring_offsets(cfg)
    t0 = t0_ref[0]                              # global step of this chunk

    # rings carried in the output ref (aliased to the input by the caller)
    rings_ref[:] = rings_in_ref[:]

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)

    def one_hot(tok_row):                       # [1, B] i32 -> [Q, B] bf16
        return (q_iota == tok_row).astype(jnp.bfloat16)

    def step(t, carry):
        token, prev = carry                     # each [1, B] int32
        x = (jnp.dot(ecur_ref[:], one_hot(token),
                     preferred_element_type=jnp.float32)
             + jnp.dot(eprev_ref[:], one_hot(prev),
                       preferred_element_type=jnp.float32))
        x = x.astype(jnp.bfloat16)              # [R, B]
        skip = jnp.zeros((S, B), jnp.float32)

        for l in range(len(dils)):              # static unroll over layers
            d, off = dils[l], offs[l]
            slot = off + jax.lax.rem(t0 + t, d)
            old = rings_ref[slot]                            # [R, B]
            # f32 gate math to match models/wavenet.py (_layer_step): XLA
            # compiles the scan path with excess precision on TPU, so the
            # kernel must NOT round z to bf16
            z = (jnp.dot(wcur_ref[l], x, preferred_element_type=jnp.float32)
                 + jnp.dot(wprev_ref[l], old,
                           preferred_element_type=jnp.float32)
                 + b_ref[l])                    # [2R, B] f32 (+ [2R, 1] bias)
            h = (jnp.tanh(z[:R, :]) * jax.nn.sigmoid(z[R:, :])
                 ).astype(jnp.bfloat16)
            skip = (skip
                    + jnp.dot(wskip_ref[l], h,
                              preferred_element_type=jnp.float32)
                    + bskip_ref[l])
            rings_ref[slot] = x
            x = x + (jnp.dot(wres_ref[l], h,
                             preferred_element_type=jnp.float32)
                     + bres_ref[l]).astype(jnp.bfloat16)

        s = jnp.maximum(skip, 0.0).astype(jnp.bfloat16)
        s = jnp.maximum(
            jnp.dot(hw1_ref[:], s, preferred_element_type=jnp.float32)
            + hb1_ref[:], 0.0).astype(jnp.bfloat16)
        logits = (jnp.dot(hw2_ref[:], s, preferred_element_type=jnp.float32)
                  + hb2_ref[:])                 # [Q, B] f32

        if temperature > 0:                     # static: 0 => greedy decode
            u = _counter_rng_uniform(seed_ref[0], t0 + t, (Q, B))
            gumbel = -jnp.log(-jnp.log(u))
            scores = logits * (1.0 / temperature) + gumbel
        else:
            scores = logits
        nxt = jnp.argmax(scores, axis=0, keepdims=True).astype(jnp.int32)

        tokens_out_ref[pl.ds(t, 1), :] = nxt    # [1, B] row store
        if num_forced > 0:
            # teacher-forced priming: the token CONSUMED at step t+1 comes
            # from the prime sequence while t+1 < num_forced (global steps)
            g = t0 + t + 1
            idx = jnp.minimum(g, num_forced - 1)
            forced_row = forced_ref[pl.ds(idx, 1), :]
            nxt = jnp.where(g < num_forced, forced_row, nxt)
        return (nxt, token)

    token, prev = jax.lax.fori_loop(
        0, num_steps, step,
        (tokens_init_ref[0:1, :], tokens_init_ref[1:2, :]))
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
        ecur = ecur @ params["w_embed_proj"]
        eprev = eprev @ params["w_embed_proj"]
    col = lambda b: b[..., None].astype(jnp.float32)          # [..., X] -> [..., X, 1]
    return (
        ecur.T.astype(bf), eprev.T.astype(bf),                # [R, Q]
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
                                             "temperature", "interpret"))
def decode_chunk(params, cfg: WaveNetConfig, rings: jax.Array,
                 tokens_init: jax.Array, t0: jax.Array, seed: jax.Array,
                 num_steps: int,
                 temperature: float = 1.0, interpret: bool = False,
                 forced=None):
    """Generate `num_steps` tokens in one kernel launch.

    rings: [sum_d, R, B] bf16 ring state in kernel layout (zeros at start;
      treat as opaque between chunks).
    tokens_init: [B, 2] int32 — column 0 the token consumed at the first
      step, column 1 the token before it (0 at sequence start).
    t0: scalar int32 global step index of the chunk start (ring phase).
    Returns (tokens [B, num_steps] i32, rings', carry [B, 2]) where carry is
    the tokens_init for the next chunk (pass t0 + num_steps with it).
    """
    B = tokens_init.shape[0]
    _, sum_d = _ring_offsets(cfg)
    ops = _flatten_params(params, cfg)

    num_forced = 0 if forced is None else forced.shape[1]
    forced_t = (jnp.zeros((1, B), jnp.int32) if forced is None
                else forced.T.astype(jnp.int32))
    kernel = functools.partial(_decode_kernel, cfg, num_steps, temperature,
                               num_forced)
    n_in = 4 + len(ops) + 1
    tokens_t, rings_out, carry_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_steps, B), jnp.int32),
            jax.ShapeDtypeStruct((sum_d, cfg.residual_channels, B),
                                 jnp.bfloat16),
            jax.ShapeDtypeStruct((2, B), jnp.int32),
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2      # seed, t0
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in - 2)
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={n_in - 1: 1},                  # rings in -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET + 2 * 1024 * 1024),
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      jnp.asarray(t0, jnp.int32).reshape(1),
      tokens_init.T, forced_t, *ops, rings)
    return tokens_t.T, rings_out, carry_t.T


def generate_pallas(params, cfg: WaveNetConfig, key: jax.Array,
                    num_samples: int, batch: int = 1,
                    prime_tokens=None,
                    temperature: float = 1.0,
                    chunk: int = 2048, interpret: bool = False) -> jax.Array:
    """Drop-in fast generation via the whole-loop kernel, chunked so the
    output buffer stays in VMEM.  Supports teacher-forced priming
    (prime_tokens [B, P]); unconditional only — callers should check
    fits_vmem() and fall back to models.wavenet.generate otherwise."""
    if not fits_vmem(cfg, batch, min(chunk, num_samples)):
        raise ValueError("model/batch too large for the VMEM-resident decode "
                         "kernel; use models.wavenet.generate")
    _, sum_d = _ring_offsets(cfg)
    R = cfg.residual_channels
    rings = jnp.zeros((sum_d, R, batch), jnp.bfloat16)
    P = 0 if prime_tokens is None else prime_tokens.shape[1]
    if P:
        first = prime_tokens[:, 0:1].astype(jnp.int32)
    else:
        first = jnp.full((batch, 1), cfg.quantization_channels // 2,
                         jnp.int32)
    carry = jnp.concatenate([first, jnp.zeros((batch, 1), jnp.int32)], axis=1)
    seed = jax.random.randint(key, (), 0, 2**31 - 1)
    # total steps: P-1 priming steps consume prime[1:], then num_samples
    # free-running steps; outputs before the first free sample are dropped.
    # Every launch uses the SAME static chunk size (one compile): the tail
    # over-generates up to chunk-1 discarded samples, far cheaper than a
    # second ~30s kernel compile for the odd-sized tail.
    total = max(P - 1, 0) + num_samples
    n = min(chunk, total)
    outs = []
    done = 0
    while done < total:
        toks, rings, carry = decode_chunk(
            params, cfg, rings, carry, jnp.int32(done), seed, n, temperature,
            interpret=interpret, forced=prime_tokens)
        outs.append(toks)
        done += n
    return jnp.concatenate(outs, axis=1)[:, max(P - 1, 0):
                                         max(P - 1, 0) + num_samples]
