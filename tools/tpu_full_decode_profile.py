#!/usr/bin/env python
"""Profile the XLA scan decoder ON the `full` preset (round-3 verdict #3).

The full preset is the one shipped config whose decode the transposed
whole-loop kernel cannot serve (rings lane-pad past VMEM at R >= 128), so
the scan's speed there matters.  This tool answers where the per-step time
goes, with two methods:

  1. MARGINAL cost: re-time the step with one component removed (ring
     gather / ring scatter / gated activations / head+argmax).  Run on v5e
     2026-08-19: removing ANY single component moves the step < 2% — the
     scan is not bound by any of them.
  2. UNROLL sweep: `lax.scan(..., unroll=k)` over the 40-layer inner scan.
     unroll=8 cuts 120 -> 80 us/step (+50% throughput; compile time 104 s),
     unroll=40 regresses (105 us).  The step is bound by the serialized
     per-layer critical path (~3 us/layer of small dependent matmuls whose
     latency XLA does not hide at B=8), exactly the structure the wide-R
     Pallas kernel (ops/pallas/decode_wide.py) attacks by keeping weights
     VMEM-resident and issuing back-to-back MXU ops with no per-layer
     kernel boundaries.

Timing is READBACK-based (np.asarray of the tokens): on the tunneled
runtime, jax.block_until_ready was observed returning before execution
finished on freshly-built jits (12M "steps/s"), so every window forces a
device->host copy of the [B, N] int32 tokens (~32 KB — negligible).

Writes runs/evidence/full_decode/profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavenet_tpu.config import full
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.models.wavenet import (_dot, _stacked_layer_params,
                                        decode_init, dilation_array,
                                        embed_tokens, head_logits,
                                        ring_offsets)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "runs", "evidence", "full_decode")
B, N = 8, 1024


def build(cfg, params, drop: str = "none", inner_unroll: int = 1):
    """A greedy decode scan with one component optionally removed."""
    cdt = jnp.bfloat16
    R, S, Q, L = (cfg.residual_channels, cfg.skip_channels,
                  cfg.quantization_channels, cfg.num_layers)
    offs = jnp.asarray(ring_offsets(cfg)[0], jnp.int32)
    dils = dilation_array(cfg)
    stacked = _stacked_layer_params(params)
    q0 = decode_init(cfg, B).queues

    def step(carry, i):
        queues, token, t = carry
        x = embed_tokens(params, cfg, token, token)
        skip = jnp.zeros((B, S), jnp.float32)
        slots = offs + jnp.mod(t, dils)
        if drop == "gather":
            # data-dependent stand-in (a zeros constant would let XLA fold
            # the w_prev matmuls away and over-report the gather's cost)
            old_all = jnp.broadcast_to(x[None], (L, B, R))
        else:
            old_all = queues[slots]

        def body(c, pl_):
            x, skip = c
            lp = pl_["lp"]
            z = (_dot(x, lp["w_cur"].astype(cdt))
                 + _dot(pl_["old"].astype(cdt), lp["w_prev"].astype(cdt))
                 + lp["b"].astype(jnp.float32))
            if drop == "gate":
                h = (z[..., 0, :] * z[..., 1, :]).astype(cdt)
            else:
                h = (jnp.tanh(z[..., 0, :])
                     * jax.nn.sigmoid(z[..., 1, :])).astype(cdt)
            skip = (skip + _dot(h, lp["w_skip"].astype(cdt))
                    + lp["b_skip"].astype(jnp.float32))
            x = (x.astype(jnp.float32) + _dot(h, lp["w_res"].astype(cdt))
                 + lp["b_res"].astype(jnp.float32)).astype(cdt)
            return (x, skip), x

        (x, skip), layer_inputs = jax.lax.scan(
            body, (x, skip), {"lp": stacked, "old": old_all},
            unroll=inner_unroll)
        if drop != "scatter":
            queues = queues.at[slots].set(layer_inputs.astype(queues.dtype))
        if drop == "head":
            token = jnp.clip(jnp.sum(skip, -1).astype(jnp.int32), 0, Q - 1)
        else:
            logits = head_logits(params, cfg, skip)
            token = jnp.argmax(logits, -1).astype(jnp.int32)
        return (queues, token, t + 1), token

    def run(bias):
        (_, _, _), toks = jax.lax.scan(
            step, (q0 + bias, jnp.zeros((B,), jnp.int32), jnp.int32(0)),
            jnp.arange(N))
        return toks

    return jax.jit(run)


def time_fn(f, arg, reps=3):
    t0 = time.perf_counter()
    np.asarray(f(arg))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(arg))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e6, compile_s        # us/step, compile seconds


def main():
    assert jax.devices()[0].platform != "cpu", "profile runs on TPU"
    cfg = full()
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    zero = jnp.zeros((), jnp.bfloat16)
    rec = {"preset": "full", "batch": B, "steps_per_window": N,
           "date": time.strftime("%Y-%m-%d"),
           "marginal_us_per_step": {}, "unroll_us_per_step": {}}
    for drop in ("none", "gather", "scatter", "gate", "head"):
        us, _ = time_fn(build(cfg, params, drop=drop), zero)
        rec["marginal_us_per_step"][drop] = round(us, 1)
        print(f"drop {drop:8s}: {us:7.1f} us/step", flush=True)
    for iu in (8, 40):
        us, comp = time_fn(build(cfg, params, inner_unroll=iu), zero)
        rec["unroll_us_per_step"][str(iu)] = round(us, 1)
        rec.setdefault("unroll_compile_s", {})[str(iu)] = round(comp, 1)
        print(f"unroll {iu:2d}: {us:7.1f} us/step (compile {comp:.0f}s)",
              flush=True)
    # the shipped decoder, for the record (sampled, via wn.generate)
    gen = jax.jit(lambda p, k: wn.generate(p, cfg, k, num_samples=N, batch=B))
    key = jax.random.PRNGKey(1)
    np.asarray(gen(params, key))
    best = min(time_fn(lambda k: gen(params, k), key)[0] for _ in range(1))
    rec["shipped_generate_us_per_step"] = round(best, 1)
    rec["shipped_generate_steps_per_sec"] = round(1e6 / best)
    rec["realtime_factor_16k"] = round(1e6 / best / cfg.sample_rate, 3)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "profile.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
