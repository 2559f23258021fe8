"""Pipeline parallelism for the FUSED training stack over the `model` axis.

Round 1's Megatron channel sharding (parallel/sharding.py) composes with the
XLA scan path but NOT with the fused Pallas layer-group kernels: inside a
group, every layer's residual update needs the FULL channel width of x
before the next layer can run, so column/row sharding would force a psum
per LAYER inside the kernel — no such collective exists in a pallas_call,
and hoisting it out dissolves the fusion that makes the kernel fast.

The sharding that DOES compose is the one the kernel's own structure
suggests: the fused path is already a chain of layer-group kernels, so the
`model` axis shards the LAYER axis — classic pipeline parallelism:

  * stage s owns a contiguous run of whole dilation BLOCKS (requires
    cfg.num_blocks % mp == 0), so every stage's static dilation pattern is
    identical and the shard_map traces ONE program (SPMD);
  * microbatches (batch-axis slices) flow through stages GPipe-style: at
    schedule step k, stage s runs microbatch k-s and ppermutes its residual
    stream x [Bmu, T, R] and skip accumulator [Bmu, T, S] to stage s+1 over
    ICI.  Bubble fraction = (mp-1)/(n_mu + mp - 1);
  * the finished skip-sums are reconstituted from the last stage with one
    masked psum; the head + loss then run replicated;
  * backward is NOT hand-written: group_apply (ops/pallas/train_stack.py)
    carries the kernel VJP, and JAX transposes the scan + ppermute schedule
    into the reverse pipeline automatically.

Params for this path are LAYER-sharded (sharding.param_pspecs_layer):
stacked [L, ...] leaves split on the leading axis, embed/head/upsampler
replicated.  Activation/weight memory per chip scales 1/mp.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
from wavenet_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stage_dilations(cfg: WaveNetConfig, mp: int) -> Tuple[int, ...]:
    """The (identical) dilation pattern of every pipeline stage."""
    if cfg.num_blocks % mp:
        raise ValueError(f"num_blocks={cfg.num_blocks} not divisible by "
                         f"model_parallel={mp}: pipeline stages must own "
                         f"whole dilation blocks")
    L = cfg.num_layers
    return tuple(cfg.dilations[:L // mp])


def supported(cfg: WaveNetConfig, T: int, mp: int) -> bool:
    """Can the fused stack run as an mp-stage pipeline on windows of T?"""
    if mp < 1 or cfg.num_blocks % mp or cfg.kernel_size != 2:
        return False
    TT = ts.pick_tile(cfg, T)
    return bool(TT) and bool(ts.plan_dils(cfg, stage_dilations(cfg, mp), TT))


def _stage_chain(cfg, interpret, TT, dils, nb, stage_params, x, skip, y,
                 g=None):
    """All layer groups of one stage (chained group_apply kernels).
    g: None or [Bmu, L_stage, 2R] f32 global-conditioning offsets for this
    stage's layers.  nb: (fwd, bwd) rows per grid step — the group plan must
    be computed with the SAME nb the kernels run with (VMEM feasibility)."""
    groups = ts.plan_dils(cfg, dils, TT, nb)
    if not groups:
        raise ValueError(f"no VMEM-feasible group plan for stage dils={dils} "
                         f"at nb={nb}; gate on pipeline.supported()")
    for lo, hi in groups:
        gw = {k: stage_params[k][lo:hi] for k in ts.GROUP_KEYS}
        if y is not None:
            gw["v_cond"] = stage_params["v_cond"][lo:hi]
        skip, x = ts.group_apply(cfg, interpret, TT, dils[lo:hi], nb,
                                 x, skip, gw, y,
                                 None if g is None else g[:, lo:hi])
    return skip, x


def loss_fn_pp(params: wn.Params, cfg: WaveNetConfig, mesh: Mesh,
               tokens: jax.Array,
               mel: Optional[jax.Array] = None,
               speaker: Optional[jax.Array] = None,
               microbatch: int = 1,
               interpret: bool = False,
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pipelined fused training loss over tokens [B, W+1].

    tokens shard over `data`; stacked layer params shard over `model`
    (param_pspecs_layer).  Must be called under jit (partial-manual
    shard_map constraint, as parallel/seqpar.py).
    """
    mp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    B, Wp1 = tokens.shape
    W = Wp1 - 1
    TT = ts.pick_tile(cfg, W)
    if not supported(cfg, W, mp):
        raise ValueError("config not pipeline-shardable; gate on supported()")
    dils = stage_dilations(cfg, mp)
    B_loc = B // dp
    Bmu = min(microbatch, B_loc)
    if B_loc % Bmu:
        raise ValueError(f"local batch {B_loc} not divisible by "
                         f"microbatch {Bmu}")
    n_mu = B_loc // Bmu
    nsteps = n_mu + mp - 1
    R = cfg.residual_channels
    S = cfg.skip_channels
    # multi-row grid steps over the microbatch ([1,1] always feasible)
    nb = ts.pick_nb_dils(cfg, dils, W, Bmu, TT)

    y_all = None
    if cfg.mel is not None:
        from wavenet_tpu.models.conditioning import upsample_mel
        y_all = upsample_mel(params["upsampler"], cfg.mel, mel, W)

    def run(params, tokens, y_all, speaker):
        s = jax.lax.axis_index(MODEL_AXIS)
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        prev = jnp.pad(inputs[:, :-1], ((0, 0), (1, 0)))
        x_emb = wn.embed_tokens(params, cfg, inputs, prev)     # [B_loc, W, R]
        x_emb = x_emb.astype(jnp.bfloat16).astype(jnp.float32)
        # per-STAGE global offsets: v_global is layer-sharded, so the local
        # slice yields exactly this stage's [L_loc, B_loc, 2, R]; batch-
        # leading layout so mb() slices microbatches uniformly
        g_st = None
        if speaker is not None:
            g_st = wn.global_cond_offsets(params, cfg, speaker)
            Lloc = g_st.shape[0]
            g_st = g_st.transpose(1, 0, 2, 3).reshape(B_loc, Lloc, 2 * R)

        def mb(arr, k):
            """Microbatch k (k clamped into range; value unused out of
            range)."""
            i = jax.lax.rem(k, n_mu) * Bmu
            return jax.lax.dynamic_slice_in_dim(arr, i, Bmu, axis=0)

        fwd = [(i, i + 1) for i in range(mp - 1)]

        def body(carry, k):
            x_in, skip_in = carry
            y_mb = None if y_all is None else mb(y_all, k - s)
            g_mb = None if g_st is None else mb(g_st, k - s)
            skip_out, x_out = _stage_chain(cfg, interpret, TT, dils, nb,
                                           params, x_in, skip_in, y_mb,
                                           g_mb)
            x_nxt = jax.lax.ppermute(x_out, MODEL_AXIS, fwd)
            skip_nxt = jax.lax.ppermute(skip_out, MODEL_AXIS, fwd)
            first = (s == 0)
            x_next_in = jnp.where(first, mb(x_emb, k + 1), x_nxt)
            skip_next_in = jnp.where(first, jnp.zeros_like(skip_nxt),
                                     skip_nxt)
            return (x_next_in, skip_next_in), skip_out

        carry0 = (mb(x_emb, 0), jnp.zeros((Bmu, W, S), jnp.float32))
        _, emitted = jax.lax.scan(body, carry0, jnp.arange(nsteps))
        # finished microbatches live on the LAST stage at steps >= mp-1;
        # one masked psum reconstitutes them on every stage
        finished = emitted[mp - 1:]                  # [n_mu, Bmu, W, S]
        skip_full = jax.lax.psum(
            jnp.where(s == mp - 1, finished, jnp.zeros_like(finished)),
            MODEL_AXIS)
        skip_full = skip_full.reshape(B_loc, W, S)

        logits = wn.head_logits(params, cfg, skip_full)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        correct = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
        return jnp.stack([jnp.sum(nll), jnp.sum(correct)])[None]   # [1, 2]

    from wavenet_tpu.parallel import sharding as shd
    pspecs = shd.param_pspecs_layer(cfg)
    in_specs = (pspecs, P(DATA_AXIS, None),
                P(DATA_AXIS, None, None) if y_all is not None else P(),
                P(DATA_AXIS) if speaker is not None else P())
    sums = jax.shard_map(
        run, mesh=mesh,
        in_specs=in_specs,
        out_specs=P((DATA_AXIS, MODEL_AXIS), None),
        axis_names=frozenset({DATA_AXIS, MODEL_AXIS}),
        check_vma=False,
    )(params, tokens, y_all, speaker)
    # model shards all computed identical sums; data shards hold partials.
    total = jnp.sum(sums.reshape(dp, mp, 2)[:, 0], axis=0)
    n = jnp.asarray(B * W, jnp.float32)
    loss = total[0] / n
    return loss, {"loss": loss, "bits_per_sample": loss / jnp.log(2.0),
                  "accuracy": total[1] / n}
