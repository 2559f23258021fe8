"""Distributed autoregressive generation — component P3.

BASELINE north_star: "generation exchanges cached conv states and sampled
tokens via collectives".  This is that mechanism, explicitly scheduled with
`jax.shard_map` over the (data, model) mesh axes (SURVEY.md §3.3):

  * ring buffers (the per-layer conv caches of arXiv:1611.09482) shard their
    BATCH axis over `data`; with `shard_rings_model=True` they additionally
    shard the CHANNEL axis over `model`, and every per-layer read
    reconstitutes the cached state with an `all_gather` over `model` — the
    cached-conv-state exchange, riding ICI;
  * the gated layers run Megatron-style (parallel/sharding.py): filter/gate
    columns are `model`-local, and the row-parallel residual update ends in
    ONE `psum` over `model` per layer — the second state-exchange collective;
  * skip partial-sums accumulate locally and take a single `psum` at the
    head;
  * the head's Q (class) dim stays column-sharded; sampling is a
    DISTRIBUTED Gumbel-argmax: each shard draws noise for its own class
    columns from a counter-based RNG keyed by (seed, step, global row,
    global class) — shard-layout independent — takes its local argmax, and
    the winning token is exchanged with a `pmax` + masked-`psum` pair over
    `model`.  No logits all_gather is ever materialized.

Token equality across mesh layouts: because the sampling noise is keyed by
GLOBAL (row, class) coordinates, a (1,1,1)-mesh run, a data-sharded run, and
a model-sharded run all sample identical tokens (tested in
tests/test_distributed_decode.py), up to float-associativity of the psum.

The whole loop is one `lax.scan` inside one `shard_map` inside one jit —
zero per-sample dispatch, matching SURVEY.md §7.4.
"""

from __future__ import annotations

import functools
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from wavenet_tpu.parallel import sharding as shd


# ---------------------------------------------------------------------------
# Counter-based sampling noise (jnp mirror of ops/pallas/decode.py's RNG):
# keyed by global coordinates so it is independent of the shard layout.
# ---------------------------------------------------------------------------

def _mix(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def counter_uniform(seed, t, row0, col0, shape):
    """Uniform (0,1) noise for a [rows, cols] tile whose global origin is
    (row0, col0) — same value for the same global coordinate regardless of
    how the batch/class axes are sharded.

    Everything is cast to uint32 BEFORE the mix: row0/col0 arrive as traced
    int32 scalars, and int32 + uint32 promotes to int32 under JAX's rules —
    the murmur shifts then run ARITHMETIC and h ^ (h >> 16) clears the sign
    bit, which squeezed the output into (0, 0.5) and truncated the Gumbel
    right tail (low-logit tokens could never win a sample)."""
    rows = (jnp.asarray(row0).astype(jnp.uint32)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 0))
    cols = (jnp.asarray(col0).astype(jnp.uint32)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    idx = rows * jnp.uint32(65536) + cols
    h = (jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + jnp.asarray(t).astype(jnp.uint32) * jnp.uint32(0x7F4A7C15) + idx)
    bits = _mix(_mix(h) + idx)
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * (1.0 / (1 << 24)) + 1e-12)


def counter_gumbel(seed, t, row0, col0, shape):
    return -jnp.log(-jnp.log(counter_uniform(seed, t, row0, col0, shape)))


# ---------------------------------------------------------------------------
# The per-sample sharded decode step (runs INSIDE shard_map)
# ---------------------------------------------------------------------------

def _layer_scan_local(cfg: WaveNetConfig, params_local, x, old_all,
                      use_psum: bool, gcond=None, cond=None):
    """All gated layers on the local shard.  x, old_all carry FULL channel
    width (replicated over `model`); weights are the local Megatron slices,
    so z/h have model-local columns and the row-parallel res product ends in
    a psum over `model` per layer (the conv-state exchange).

    gcond: None or [L, B, 2, R/mp] f32 global-conditioning gate offsets —
    v_global is COLUMN-sharded like w_cur (parallel/sharding.py), so the
    locally-computed offsets align with the local z columns; no collective.
    cond: None or [L, B, 2, R/mp] f32 local-conditioning contribution at
    THIS step (y_t @ v_cond with the local column slice — same alignment)."""
    cdt = jnp.dtype(cfg.compute_dtype)
    stacked = {k: params_local[k] for k in
               ("w_cur", "w_prev", "b", "w_res", "b_res", "w_skip", "b_skip")}
    B = x.shape[0]
    S_local = params_local["w_skip"].shape[-1]

    def body(carry, lp):
        x, skip = carry
        x_prev = lp["old"].astype(cdt)
        z = (wn._dot(x, lp["w_cur"].astype(cdt))
             + wn._dot(x_prev, lp["w_prev"].astype(cdt))
             + lp["b"].astype(jnp.float32))       # [B, 2, R/mp] f32
        if "gcond" in lp:
            z = z + lp["gcond"]
        if "cond" in lp:
            z = z + lp["cond"]                    # [B, 2, R/mp] f32
        h = (jnp.tanh(z[..., 0, :]) * jax.nn.sigmoid(z[..., 1, :])).astype(cdt)
        # partial sums over the local R/mp rows of the row-parallel weights
        skip = skip + wn._dot(h, lp["w_skip"].astype(cdt))
        res = wn._dot(h, lp["w_res"].astype(cdt))      # [B, R] partial
        if use_psum:
            res = jax.lax.psum(res, MODEL_AXIS)        # state exchange
        # single-round residual update (see wn._layer_step)
        x_out = (x.astype(jnp.float32) + res
                 + lp["b_res"].astype(jnp.float32)).astype(cdt)
        return (x_out, skip), x                        # ys: layer INPUT

    skip0 = jnp.zeros((B, S_local), jnp.float32)
    xs = dict(stacked)
    xs["old"] = old_all
    if gcond is not None:
        xs["gcond"] = gcond
    if cond is not None:
        xs["cond"] = cond
    (x, skip), layer_inputs = jax.lax.scan(body, (x, skip0), xs)
    return x, skip, layer_inputs


def _sample_distributed(cfg: WaveNetConfig, logits_local, seed, t,
                        row0, col0, temperature: float, use_psum: bool):
    """Distributed Gumbel-argmax over the column-sharded class dim.

    logits_local: [B, Q/mp] — each shard holds class columns
    [col0, col0 + Q/mp).  Token exchange: pmax of the local best score,
    then a masked psum of the winning global class id."""
    B, Qloc = logits_local.shape
    if temperature > 0:
        g = counter_gumbel(seed, t, row0, col0, (B, Qloc))
        scores = logits_local * (1.0 / temperature) + g
    else:
        scores = logits_local
    local_best = jnp.max(scores, axis=-1)                       # [B]
    local_tok = col0 + jnp.argmax(scores, axis=-1).astype(jnp.int32)
    if not use_psum:
        return local_tok
    global_best = jax.lax.pmax(local_best, MODEL_AXIS)
    mine = (local_best == global_best)
    # ties across shards are measure-zero with continuous noise; guard by
    # keeping the lowest winning class id
    cand = jnp.where(mine, local_tok, jnp.int32(2 ** 30))
    return jax.lax.pmin(cand, MODEL_AXIS)


def decode_step_sharded(params_local, cfg: WaveNetConfig,
                        state: wn.DecodeState, token, *,
                        shard_rings_model: bool,
                        use_collectives: bool = True,
                        cond_t=None, gcond=None):
    """One sharded decode step (must run inside the (data, model) shard_map).

    state.queues: [sum_d, B/dp, Rq] where Rq = R/mp when shard_rings_model
    (reads reconstitute full R by all_gather over `model`) else R.
    cond_t: None or [L, B/dp, 2, R/mp] f32 — this step's local-conditioning
    contribution computed from the LOCAL v_cond column slice.
    Returns (new_state, logits_local [B/dp, Q/mp]).
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    R = cfg.residual_channels
    x = wn.embed_tokens(params_local, cfg, token, state.prev_token)  # [B, R]

    offs = jnp.asarray(wn.ring_offsets(cfg)[0], jnp.int32)
    dils = wn.dilation_array(cfg)
    slots = offs + jnp.mod(state.t, dils)
    old_all = state.queues[slots]                       # [L, B, Rq]
    if shard_rings_model and use_collectives:
        # cached conv-state exchange: reconstitute full channels over ICI
        old_all = jax.lax.all_gather(old_all, MODEL_AXIS, axis=2,
                                     tiled=True)        # [L, B, R]
    x, skip_partial, layer_inputs = _layer_scan_local(
        cfg, params_local, x, old_all, use_psum=use_collectives,
        gcond=gcond, cond=cond_t)

    if shard_rings_model:
        mp_idx = (jax.lax.axis_index(MODEL_AXIS) if use_collectives
                  else jnp.int32(0))
        Rq = state.queues.shape[-1]
        store = jax.lax.dynamic_slice_in_dim(layer_inputs, mp_idx * Rq, Rq,
                                             axis=2)
    else:
        store = layer_inputs
    new_queues = state.queues.at[slots].set(store.astype(state.queues.dtype))

    skip = skip_partial
    if use_collectives:
        skip = jax.lax.psum(skip, MODEL_AXIS)           # [B, S] full
    skip = skip + jnp.sum(params_local["b_skip"].astype(jnp.float32), axis=0)

    # head: w1 replicated, w2 column-sharded over Q — the local slices flow
    # through the canonical head unchanged (logits come out model-local)
    logits_local = wn.head_logits(params_local, cfg, skip)
    new_state = wn.DecodeState(queues=new_queues, prev_token=token,
                               t=state.t + 1)
    return new_state, logits_local


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def generate_sharded(params, cfg: WaveNetConfig, mesh: Mesh, seed,
                     num_samples: int, batch: int,
                     prime_tokens: Optional[jax.Array] = None,
                     speaker: Optional[jax.Array] = None,
                     y: Optional[jax.Array] = None,
                     temperature: float = 1.0,
                     shard_rings_model: bool = False) -> jax.Array:
    """Distributed fast AR generation over the (data, model) mesh.

    seed: int — sampling noise comes from the counter RNG (identical tokens
    for any mesh layout, incl. single-device; see module docstring).
    speaker: optional [batch] int32 global-conditioning ids (data-sharded).
    y: optional [batch, T, M] UPSAMPLED mel features (data-sharded; T must
    cover max(P-1,0)+num_samples) — each shard projects its step's features
    with the LOCAL v_cond column slice, aligned with the local z columns.
    Returns [batch, num_samples] int32 tokens (data-sharded).
    """
    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape[MODEL_AXIS]
    if batch % dp:
        raise ValueError(f"batch {batch} not divisible by data={dp}")
    Q = cfg.quantization_channels
    if Q % mp:
        raise ValueError(f"Q={Q} not divisible by model={mp}")
    use_coll = dp * mp * mesh.shape.get("seq", 1) > 1
    _, sum_d = wn.ring_offsets(cfg)
    Rq = cfg.residual_channels // (mp if shard_rings_model else 1)

    Pn = 0 if prime_tokens is None else prime_tokens.shape[1]
    if prime_tokens is None:
        prime_tokens = jnp.zeros((batch, 0), jnp.int32)
    if cfg.global_classes is not None and speaker is None:
        raise ValueError("cfg.global_classes set but no speaker ids passed")
    if speaker is not None and cfg.global_classes is None:
        raise ValueError("speaker ids passed but cfg.global_classes unset")
    has_sp = speaker is not None
    if not has_sp:
        speaker = jnp.zeros((batch,), jnp.int32)     # placeholder operand
    has_cond = y is not None
    total_steps = max(Pn - 1, 0) + num_samples
    if has_cond and y.shape[1] < total_steps:
        raise ValueError(f"y covers {y.shape[1]} < {total_steps} steps "
                         f"(priming included)")
    if not has_cond:
        y = jnp.zeros((batch, 1, 1))                 # placeholder operand
    seed = jnp.asarray(seed, jnp.int32)
    fn = _sharded_decode_fn(cfg, mesh, num_samples, batch, Pn,
                            float(temperature), bool(shard_rings_model),
                            has_sp, has_cond)
    # params restored from a checkpoint arrive COMMITTED to one device;
    # a jit over the mesh rejects mixed placements.  Re-place to the
    # shard_map's ACTUAL input specs (Megatron column/row sharding) — a
    # replicated put would materialize the full model per chip, defeating
    # the memory scaling model parallelism exists for.  No-op when params
    # are already placed per the specs.
    from wavenet_tpu.parallel import sharding as shd
    params = jax.device_put(params, jax.tree.map(
        lambda s: NamedSharding(mesh, s), shd.param_pspecs(cfg),
        is_leaf=lambda s: isinstance(s, P)))
    out = fn(params, prime_tokens, speaker, y, seed)
    if dp * mp * mesh.shape.get("seq", 1) == 1:
        return out[0]
    # model shards produced identical token blocks; keep the first
    return out.reshape(dp, mp, batch // dp, num_samples)[:, 0].reshape(
        batch, num_samples)


@functools.lru_cache(maxsize=64)
def _sharded_decode_fn(cfg: WaveNetConfig, mesh: Mesh, num_samples: int,
                       batch: int, Pn: int, temperature: float,
                       shard_rings_model: bool, has_sp: bool,
                       has_cond: bool):
    """One jitted sharded decode program per static signature — a fresh
    jax.jit wrapper per generate_sharded call would miss jit's
    function-identity cache and recompile the whole AR scan every time
    (30-120 s per compile on the remote-compile TPU setup)."""
    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape[MODEL_AXIS]
    Q = cfg.quantization_channels
    use_coll = dp * mp * mesh.shape.get("seq", 1) > 1
    _, sum_d = wn.ring_offsets(cfg)
    Rq = cfg.residual_channels // (mp if shard_rings_model else 1)
    total_steps = max(Pn - 1, 0) + num_samples

    def run(params_local, prime, speaker_local, y_local, seed):
        B_loc = batch // dp
        # local gate offsets from the LOCAL v_global column slice — aligns
        # with the model-local z columns by construction (sharding.py)
        gcond = (wn.global_cond_offsets(params_local, cfg, speaker_local)
                 if has_sp else None)
        cond_all = None
        if has_cond:
            cdt = jnp.dtype(cfg.compute_dtype)
            # [T, L, B_loc, 2, R/mp]: per-step local gate contributions
            cond_all = jnp.einsum(
                "btm,lmwr->tlbwr",
                y_local[:, :total_steps].astype(cdt),
                params_local["v_cond"].astype(cdt),
                preferred_element_type=jnp.float32)
        if use_coll:
            dp_idx = jax.lax.axis_index(DATA_AXIS)
            mp_idx = jax.lax.axis_index(MODEL_AXIS)
        else:
            dp_idx = mp_idx = jnp.int32(0)
        row0 = dp_idx * B_loc
        col0 = mp_idx * (Q // mp)
        state = wn.DecodeState(
            queues=jnp.zeros((sum_d, B_loc, Rq), jnp.dtype(cfg.compute_dtype)),
            prev_token=jnp.zeros((B_loc,), jnp.int32),
            t=jnp.zeros((), jnp.int32))
        step = partial(decode_step_sharded, params_local, cfg,
                       shard_rings_model=shard_rings_model,
                       use_collectives=use_coll, gcond=gcond)

        np_ = max(Pn - 1, 0)
        if Pn > 0:
            prime_t = jnp.moveaxis(prime[:, :Pn - 1], 1, 0)
            if has_cond:
                st, _ = jax.lax.scan(
                    lambda st, xs: (step(st, xs[0], cond_t=xs[1])[0], None),
                    state, (prime_t, cond_all[:np_]))
            else:
                st, _ = jax.lax.scan(
                    lambda st, t: (step(st, t)[0], None), state, prime_t)
            first = prime[:, Pn - 1]
        else:
            st = state
            first = jnp.full((B_loc,), Q // 2, jnp.int32)

        def body(carry, cond_t):
            st, tok = carry
            st, logits_local = step(st, tok, cond_t=cond_t)
            nxt = _sample_distributed(cfg, logits_local, seed, st.t, row0,
                                      col0, temperature, use_coll)
            return (st, nxt), nxt

        body_xs = (cond_all[np_:np_ + num_samples] if has_cond else None)

        def body_nc(carry, _):
            return body(carry, None)

        if has_cond:
            (_, _), samples = jax.lax.scan(body, (st, first), body_xs)
        else:
            (_, _), samples = jax.lax.scan(body_nc, (st, first), None,
                                           length=num_samples)
        return jnp.moveaxis(samples, 0, 1)[None]        # [1, B_loc, N]

    if not use_coll:
        return jax.jit(run)

    pspecs = shd.param_pspecs(cfg)
    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS, None, None), P()),
        out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
        axis_names=frozenset({DATA_AXIS, MODEL_AXIS}),
        check_vma=False,
    )
    # partial-manual shard_map (axis_names a mesh subset) only dispatches
    # under jit in jax 0.9 — same constraint as parallel/seqpar.py
    return jax.jit(sharded)


def generate_pallas_dp(params, cfg: WaveNetConfig, mesh: Mesh, key,
                       num_samples: int, batch: int,
                       temperature: float = 1.0,
                       interpret: bool = False) -> jax.Array:
    """Data-parallel fan-out of the whole-loop Pallas decode kernel: each
    chip decodes its batch/dp utterances with the full (replicated) model
    VMEM-resident.  Lets fastgen batches larger than one chip's VMEM budget
    run fully in-kernel (e.g. B=64 over 2+ chips)."""
    from wavenet_tpu.ops.pallas import decode as pdec
    dp = mesh.shape[DATA_AXIS]
    if batch % dp:
        raise ValueError(f"batch {batch} not divisible by data={dp}")
    if not pdec.fits_vmem(cfg, batch // dp):
        raise ValueError(f"per-chip batch {batch // dp} exceeds the decode "
                         f"kernel VMEM budget")
    if dp == 1:
        return pdec.generate_pallas(params, cfg, key, num_samples,
                                    batch=batch, temperature=temperature,
                                    interpret=interpret)

    def run(params, key):
        return pdec.generate_pallas(params, cfg, key[0], num_samples,
                                    batch=batch // dp,
                                    temperature=temperature,
                                    interpret=interpret)[None]

    # per-shard keys so utterances draw independent noise
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(dp))
    # checkpoint-restored params are committed to one device (see
    # generate_sharded) — re-place replicated on the mesh
    params = jax.device_put(params, NamedSharding(mesh, P()))
    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, None, None),
        axis_names=frozenset({DATA_AXIS}),
        check_vma=False,
    )
    out = jax.jit(sharded, static_argnums=())(params, keys)
    return out.reshape(batch, num_samples)
