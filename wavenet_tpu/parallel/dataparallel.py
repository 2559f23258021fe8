"""Explicit data-parallel loss via shard_map — the path that lets the fused
Pallas training kernel run under data parallelism.

GSPMD handles data parallelism transparently for the XLA scan path, but a
`pallas_call` inside a GSPMD-partitioned computation is not automatically
spatially partitioned.  Wrapping the loss in `shard_map` over ('data',)
gives each shard a fully-local batch slice, so the kernel runs unchanged
per-chip; parameters enter replicated (in_spec P()) and shard_map's autodiff
transpose inserts the gradient psum automatically.

Same partial-sums-out pattern as parallel/seqpar.py (jax 0.9 partial-manual
shard_map rejects replicated outputs; must run under jit).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.parallel.mesh import DATA_AXIS


def loss_fn_dp(params: wn.Params, cfg: WaveNetConfig, mesh: Mesh,
               tokens: jax.Array, use_fused: bool = False,
               interpret: bool = False,
               mel: Optional[jax.Array] = None,
               speaker: Optional[jax.Array] = None,
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Data-parallel training loss over tokens [B, W+1] sharded on batch.
    mel ([B, F, M], sharded on batch like tokens) routes the conditional
    vocoder through the same per-shard fused kernel (advisor r1 #3);
    speaker ([B] int32) likewise for global conditioning."""

    def local_sums(params, tokens, mel, speaker):
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        if use_fused:
            logits = wn.forward_logits_fused(params, cfg, inputs,
                                             interpret=interpret, mel=mel,
                                             speaker=speaker)
        else:
            logits = wn.forward_logits(params, cfg, inputs, mel=mel,
                                       speaker=speaker)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        correct = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
        return jnp.stack([jnp.sum(nll), jnp.sum(correct)])[None]   # [1, 2]

    sums = jax.shard_map(
        local_sums, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None),
                  P(DATA_AXIS, None, None) if mel is not None else P(),
                  P(DATA_AXIS) if speaker is not None else P()),
        out_specs=P(DATA_AXIS, None),
        axis_names=frozenset({DATA_AXIS}),
        check_vma=False,
    )(params, tokens, mel, speaker)
    total = jnp.sum(sums, axis=0)
    n = jnp.asarray(tokens.shape[0] * (tokens.shape[1] - 1), jnp.float32)
    loss = total[0] / n
    return loss, {"loss": loss, "bits_per_sample": loss / jnp.log(2.0),
                  "accuracy": total[1] / n}
