"""Generation drivers (reference `generate.py` equivalents, SURVEY.md §2
#10-11 and §3.2-3.3).

Two samplers, both fully compiled (zero per-sample Python dispatch):

  * `generate_naive` — the reference's O(receptive_field) per-sample
    algorithm: re-run the full-window forward for every sample, inside one
    lax.scan over a sliding token window.  Kept for equivalence testing and
    as the honest "reference algorithm" baseline for benchmarks.
  * `wavenet_tpu.models.wavenet.generate` — the fast cached-queue decoder
    (O(layers)/sample), re-exported here as `generate_fast`.

Plus waveform-level helpers that close the loop to audio files.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.audio import mulaw
from wavenet_tpu.audio.io import write_wav
from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn

generate_fast = wn.generate


def _tpu_backend() -> bool:
    """The Mosaic kernel path is TPU-only: route known non-TPU backends
    (cpu, cuda, rocm) to the XLA fallback — `platform != "cpu"` would send
    a CUDA box into pltpu lowering and crash.  Exclusion rather than
    `== "tpu"` because the tunneled runtime registers under its plugin
    name ('axon') and must keep taking the kernel path."""
    return jax.devices()[0].platform not in ("cpu", "gpu", "cuda", "rocm")


def generate_auto(params: wn.Params, cfg: WaveNetConfig, key: jax.Array,
                  num_samples: int, batch: int = 1,
                  prime_tokens: Optional[jax.Array] = None,
                  cond: Optional[jax.Array] = None,
                  y: Optional[jax.Array] = None,
                  speaker: Optional[jax.Array] = None,
                  temperature: float = 1.0,
                  seeds=None) -> jax.Array:
    """Fastest available decoder: the whole-loop Pallas kernel when the model
    fits the per-tile VMEM budget (incl. priming and, via `y`, local mel
    conditioning), else the XLA scan.

    y: [B, T, M] UPSAMPLED conditioning features (sample rate) — the Pallas
       kernel streams these and projects them in-kernel.  `cond` is the
       pre-projected [B, T, L, 2, R] form consumed by the XLA path; pass one
       or the other, not both.
    speaker: [B] int32 global-conditioning ids (cfg.global_classes set).
    seeds: optional per-row (per-request) counter-RNG seeds (ops/rng.py) —
       both routes then sample with the SAME hash, so each row's audio is
       independent of co-batched rows and (for bfloat16 compute) the route
       taken.
    """
    from wavenet_tpu.ops.pallas import decode as pdec
    from wavenet_tpu.ops.pallas import decode_wide as pwide
    if cond is not None and y is not None:
        raise ValueError("pass either y (features) or cond (projections)")
    on_tpu = _tpu_backend()
    P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
    if on_tpu and cond is None and pdec.fits_vmem(cfg, batch, prime_len=P0):
        return pdec.generate_pallas(params, cfg, key, num_samples,
                                    batch=batch, prime_tokens=prime_tokens,
                                    y=y, speaker=speaker,
                                    temperature=temperature, seeds=seeds)
    if (on_tpu and cond is None
            and pwide.fits_vmem(cfg, batch, prime_len=P0)):
        # wide-R models (the `full` / `full_vocoder` presets) take the
        # channels-on-lanes kernel — mel streamed in-kernel: ~8.5x the XLA
        # scan at steady state (BASELINE.md round 4)
        return pwide.generate_wide(params, cfg, key, num_samples,
                                   batch=batch, prime_tokens=prime_tokens,
                                   y=y, speaker=speaker,
                                   temperature=temperature, seeds=seeds)
    if y is not None:
        from wavenet_tpu.models.conditioning import project_cond
        cond = project_cond(params, y)
    if seeds is not None:
        from wavenet_tpu.ops import rng
        seeds = rng.as_row_seeds(seeds, batch)
    return wn.generate(params, cfg, key, num_samples, batch=batch,
                       prime_tokens=prime_tokens, cond=cond, speaker=speaker,
                       temperature=temperature, seeds=seeds)


def generate_stream(params: wn.Params, cfg: WaveNetConfig, key: jax.Array,
                    num_samples: int, chunk_samples: int = 16000,
                    batch: int = 1,
                    prime_tokens: Optional[jax.Array] = None,
                    y: Optional[jax.Array] = None,
                    speaker: Optional[jax.Array] = None,
                    temperature: float = 1.0,
                    interpret: bool = False,
                    seeds=None):
    """Streaming generation: yields [B, <=chunk_samples] int32 token chunks.

    Long-form / serving entry point: memory is bounded by one chunk (ring
    state carries between kernel launches), and the emitted tokens are
    IDENTICAL to the one-shot Pallas decode — the in-kernel RNG is keyed by
    the global step, so chunking does not change the sample path (the
    decode_chunk continuation contract, tests/test_pallas_decode.py).

    y: [B, T, M] upsampled mel features covering max(P-1,0)+num_samples
    steps; speaker: [B] int32 ids (cfg.global_classes).
    seeds: optional per-row (per-request) counter-RNG seeds (ops/rng.py).
    """
    from wavenet_tpu.ops.pallas import decode as pdec
    from wavenet_tpu.ops.pallas import decode_wide as pwide
    # the kernel only compiles for TPU; on any other backend run it emulated
    # so the streaming API works everywhere (tests, dev boxes)
    interpret = interpret or not _tpu_backend()
    P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
    if not pdec.fits_vmem(cfg, batch, prime_len=P0):
        if pwide.fits_vmem(cfg, batch, prime_len=P0):
            # wide-R models stream through the channels-on-lanes kernel
            # (mel y sliced per chunk) with the same carried-rings contract
            yield from _stream_wide(params, cfg, key, num_samples,
                                    chunk_samples, batch, prime_tokens, y,
                                    speaker, temperature, interpret,
                                    seeds=seeds)
            return
        # configs past both kernels' VMEM plans stream through the XLA scan
        # instead (chunked decode_step; tokens match what generate_auto's
        # one-shot XLA path would emit) — streaming stays total
        yield from _stream_scan(params, cfg, key, num_samples,
                                chunk_samples, batch, prime_tokens, y,
                                speaker, temperature, seeds=seeds)
        return
    rings, carry, seed, g, P, total = pdec.setup_decode(
        params, cfg, key, batch, num_samples, prime_tokens, speaker,
        seeds=seeds)
    Bt, TC = pdec.plan_tiles(cfg, batch)
    # small interactive chunks: shrink the kernel's time block toward the
    # requested chunk instead of forcing 2048-step latency
    TC = pdec.shrink_tc(TC, chunk_samples)
    chunk = max(TC, chunk_samples // TC * TC)
    if y is not None and y.shape[1] < total:
        raise ValueError(f"y covers {y.shape[1]} < {total} steps "
                         f"(priming included)")

    t0, skip = 0, max(P - 1, 0)                  # skip = priming outputs
    while t0 < total:
        n = min(chunk, total - t0)
        n_pad = -(-n // TC) * TC                 # pad the tail chunk
        y_c = None
        if y is not None:
            y_c = y[:, t0:t0 + n]
            if n_pad > n:
                y_c = jnp.pad(y_c, ((0, 0), (0, n_pad - n), (0, 0)))
        # the prime block is VMEM-resident per launch but only consumed at
        # global steps < P: drop it once priming is behind us
        forced = prime_tokens if t0 < P - 1 else None
        toks, rings, carry = pdec.decode_chunk(
            params, cfg, rings, carry, jnp.int32(t0), seed, n_pad,
            temperature, interpret=interpret, forced=forced,
            y=y_c, g=g, force_tiles=(Bt, TC))
        out = toks[:, :n]
        if skip:
            drop = min(skip, n)
            out, skip = out[:, drop:], skip - drop
        if out.shape[1]:
            yield out
        t0 += n


def _dp_kernel_fits(cfg: WaveNetConfig, per_chip_batch: int, prime_len: int,
                    y) -> bool:
    """True when SOME whole-loop kernel serves the per-chip shard: the
    transposed kernel for R < 128, or the wide-R kernel for R >= 128 models
    (the `full` / `full_vocoder` presets over a dp mesh) — both stream mel
    y in-kernel."""
    del y                                        # both kernels stream mel
    from wavenet_tpu.ops.pallas import decode as pdec
    from wavenet_tpu.ops.pallas import decode_wide as pwide
    return (pdec.fits_vmem(cfg, per_chip_batch, prime_len=prime_len)
            or pwide.fits_vmem(cfg, per_chip_batch, prime_len=prime_len))


def generate_distributed(params: wn.Params, cfg: WaveNetConfig, mesh,
                         seed: int, num_samples: int, batch: int,
                         prime_tokens: Optional[jax.Array] = None,
                         y: Optional[jax.Array] = None,
                         speaker: Optional[jax.Array] = None,
                         temperature: float = 1.0) -> jax.Array:
    """Multi-chip AR generation over a (data, model) mesh (SURVEY.md P3).

    seed: int scalar or [batch] per-row (per-request) seeds — tokens are
    identical for ANY mesh layout at the same seeds
    (tests/test_distributed_decode.py), so results are reproducible across
    pod shapes.  Routing under that contract: data-parallel-only meshes
    whose per-chip shard fits the kernel's VMEM plan take the whole-loop
    Pallas kernel fan-out (distdecode.generate_pallas_dp) — sampled,
    primed, and conditioned decode included, since the shared counter RNG
    (ops/rng.py) keys noise by each row's OWN seed and the kernel's logits
    bit-match the scan path under bfloat16 compute.  Model-sharded meshes
    (and non-bf16 configs, where kernel/scan logits may differ by ulps) run
    the collective loop (generate_sharded: per-layer psum conv-state
    exchange, token broadcast, same counter RNG).
    """
    from wavenet_tpu.parallel import distdecode
    dp = mesh.shape.get(distdecode.DATA_AXIS, 1)
    mp = mesh.shape.get(distdecode.MODEL_AXIS, 1)
    P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
    greedy = isinstance(temperature, (int, float)) and temperature <= 0
    if (mp == 1 and _tpu_backend() and batch % dp == 0
            and (cfg.compute_dtype == "bfloat16" or greedy)
            and _dp_kernel_fits(cfg, batch // dp, P0, y)):
        return distdecode.generate_pallas_dp(params, cfg, mesh, seed,
                                             num_samples, batch,
                                             prime_tokens=prime_tokens,
                                             speaker=speaker, y=y,
                                             temperature=temperature)
    return distdecode.generate_sharded(params, cfg, mesh, seed, num_samples,
                                       batch, prime_tokens=prime_tokens,
                                       speaker=speaker, y=y,
                                       temperature=temperature)


def stream_distributed(params: wn.Params, cfg: WaveNetConfig, mesh,
                       seed, num_samples: int, batch: int,
                       chunk_samples: int = 16000,
                       prime_tokens: Optional[jax.Array] = None,
                       y: Optional[jax.Array] = None,
                       speaker: Optional[jax.Array] = None,
                       temperature: float = 1.0):
    """STREAMING multi-chip AR generation: yields [batch, <=chunk] int32
    token chunks, bit-identical to the one-shot generate_distributed at the
    same seeds (both route on the same rule and both key sampling by the
    global step).  Mesh serving clients hear audio after one chunk instead
    of the full utterance (round-2 verdict #3).

    Routing mirrors generate_distributed: data-parallel-only meshes within
    the kernel's per-chip VMEM plan stream shard_map'd whole-loop kernel
    chunks (distdecode.generate_pallas_dp_stream); model-sharded meshes
    stream chunked collective scans carrying the sharded DecodeState
    (distdecode.generate_sharded_stream)."""
    from wavenet_tpu.parallel import distdecode
    dp = mesh.shape.get(distdecode.DATA_AXIS, 1)
    mp = mesh.shape.get(distdecode.MODEL_AXIS, 1)
    P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
    greedy = isinstance(temperature, (int, float)) and temperature <= 0
    if (mp == 1 and _tpu_backend() and batch % dp == 0
            and (cfg.compute_dtype == "bfloat16" or greedy)
            and _dp_kernel_fits(cfg, batch // dp, P0, y)):
        yield from distdecode.generate_pallas_dp_stream(
            params, cfg, mesh, seed, num_samples, batch,
            chunk_samples=chunk_samples, prime_tokens=prime_tokens,
            speaker=speaker, y=y, temperature=temperature)
        return
    yield from distdecode.generate_sharded_stream(
        params, cfg, mesh, seed, num_samples, batch,
        chunk_samples=chunk_samples, prime_tokens=prime_tokens,
        speaker=speaker, y=y, temperature=temperature)


def _stream_scan(params: wn.Params, cfg: WaveNetConfig, key: jax.Array,
                 num_samples: int, chunk_samples: int, batch: int,
                 prime_tokens, y, speaker, temperature: float, seeds=None):
    """XLA streaming fallback: chunked decode_step scans with the DecodeState
    carried between chunks.  Built on the same decode_prime +
    decode_sample_chunk primitives as wn.generate, with absolute-index
    per-step RNG — so the concatenated chunks are bit-identical to the
    one-shot XLA generate() (tested in tests/test_pallas_decode.py's
    fallback cases).  Conditioning features are projected PER CHUNK (cond is
    [.., L, 2, R] — projecting the whole timeline up front would be ~L*2*R/M
    times the size of y and defeat streaming's bounded-memory contract)."""
    import functools
    if seeds is not None:
        from wavenet_tpu.ops import rng
        seeds = rng.as_row_seeds(seeds, batch)
    P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
    skip = max(P0 - 1, 0)                        # priming decode steps
    project = None
    if y is not None:
        from wavenet_tpu.models.conditioning import project_cond
        if y.shape[1] < skip + num_samples:
            raise ValueError(f"y covers {y.shape[1]} < "
                             f"{skip + num_samples} steps (priming included)")
        project = functools.partial(project_cond, params)
    cond_prime = project(y[:, :skip]) if (project and skip) else None
    state, first, gcond = wn.decode_prime(params, cfg, batch, prime_tokens,
                                          cond=cond_prime, speaker=speaker,
                                          num_samples=0)
    chunk_fn = jax.jit(functools.partial(wn.decode_sample_chunk, cfg=cfg,
                                         gcond=gcond,
                                         temperature=temperature),
                       static_argnames=("n",))
    t0 = 0
    while t0 < num_samples:
        n = min(chunk_samples, num_samples - t0)
        cond_c = project(y[:, skip + t0:skip + t0 + n]) if project else None
        state, first, toks = chunk_fn(params, state=state, first=first,
                                      key=key, i0=jnp.int32(t0), n=n,
                                      cond=cond_c, seeds=seeds,
                                      cond_t0=jnp.int32(skip + t0))
        yield toks
        t0 += n


def _stream_wide(params: wn.Params, cfg: WaveNetConfig, key: jax.Array,
                 num_samples: int, chunk_samples: int, batch: int,
                 prime_tokens, y, speaker, temperature: float,
                 interpret: bool, seeds=None):
    """Streaming via the wide-R (channels-on-lanes) kernel: chunked
    decode_chunk launches with carried rings + token carry, bit-identical
    to the one-shot generate_wide (the counter RNG keys by global step).
    Mirrors generate_stream's transposed-kernel loop (incl. the per-chunk
    mel y slice); the chunk floors at the kernel's hardware-minimum time
    block (decode_wide.TC_MIN_HW)."""
    from wavenet_tpu.ops.pallas import decode_wide as pwide
    rings, carry, seed, g, P, total = pwide.setup_decode(
        params, cfg, key, batch, num_samples, prime_tokens, speaker,
        seeds=seeds)
    Bt, TC = pwide.plan_tiles(cfg, batch)
    tc_floor = 8 if interpret else pwide.TC_MIN_HW
    while TC > tc_floor and TC > chunk_samples:
        TC //= 2
    TC = max(TC // 8 * 8, tc_floor)
    chunk = max(TC, chunk_samples // TC * TC)
    if y is not None and y.shape[1] < total:
        raise ValueError(f"y covers {y.shape[1]} < {total} steps "
                         f"(priming included)")

    t0, skip = 0, max(P - 1, 0)                  # skip = priming outputs
    while t0 < total:
        n = min(chunk, total - t0)
        n_pad = -(-n // TC) * TC                 # pad the tail chunk
        y_c = None
        if y is not None:
            y_c = y[:, t0:t0 + n]
            if n_pad > n:
                y_c = jnp.pad(y_c, ((0, 0), (0, n_pad - n), (0, 0)))
        forced = prime_tokens if t0 < P - 1 else None
        toks, rings, carry = pwide.decode_chunk(
            params, cfg, rings, carry, jnp.int32(t0), seed, n_pad,
            temperature, interpret=interpret, forced=forced,
            y=y_c, g=g, force_tiles=(Bt, TC))
        out = toks[:, :n]
        if skip:
            drop = min(skip, n)
            out, skip = out[:, drop:], skip - drop
        if out.shape[1]:
            yield out
        t0 += n


def generate_naive(params: wn.Params, cfg: WaveNetConfig, key: jax.Array,
                   num_samples: int, batch: int = 1,
                   prime_tokens: Optional[jax.Array] = None,
                   speaker: Optional[jax.Array] = None,
                   y: Optional[jax.Array] = None,
                   temperature: float = 1.0) -> jax.Array:
    """Naive AR sampling: full receptive-field forward per sample.

    This is the slow ORACLE the cached-queue decoder is validated against,
    so it reproduces the fast path's boundary semantics exactly:

    - The window is RF+1 wide: positions [1:] feed the model, [:-1] are the
      true previous tokens (logits at t depend on tokens t-RF+1..t via
      E_cur and t-RF..t-1 via E_prev — RF+1 trailing tokens total), so the
      oldest model position never sees forward_logits' default zero-token
      prev once the window has rolled past the sequence start.
    - While the history is shorter than the window, a validity mask makes
      the missing positions contribute exactly the zero left-padding the
      fast path's empty rings see (forward_logits valid_mask docstring),
      instead of hallucinating a window full of silence tokens.
    - Mel conditioning (`y`: [B, T, M] UPSAMPLED features covering
      max(P-1, 0) + num_samples steps, the fast decoders' timeline) slides
      a matching feature window alongside the tokens: model position t'
      sees y at its ABSOLUTE decode step, zero features before sequence
      start (harmless — the validity mask re-zeroes the residual stream at
      those positions before every dilated read).  This closes the oracle
      gap on the vocoder product path (round-3 verdict #5).

    The whole loop compiles to one scan with static shapes.
    """
    rf = cfg.receptive_field
    Km1 = cfg.kernel_size - 1                  # leading history positions:
    W = rf + Km1                               # every embed tap of the
    Q = cfg.quantization_channels              # oldest model position is real
    if prime_tokens is None:
        # left-fill with token 0: masked positions are zeroed anyway, and
        # the first valid position's prev then embeds the zero-token —
        # matching forward_logits' sequence-start convention
        window = jnp.zeros((batch, W), jnp.int32).at[:, -1].set(Q // 2)
        c0 = 1                                 # valid tokens in the window
    else:
        P = prime_tokens.shape[1]
        if P >= W:
            window = prime_tokens[:, -W:].astype(jnp.int32)
            c0 = W
        else:
            window = jnp.concatenate([
                jnp.zeros((batch, W - P), jnp.int32),
                prime_tokens.astype(jnp.int32)], axis=1)
            c0 = P
    pos = jnp.arange(rf)[None, :]                              # [1, RF]

    y_pad = None
    base = 0
    if y is not None:
        if cfg.mel is None:
            raise ValueError("y passed but cfg.mel is None")
        P0 = 0 if prime_tokens is None else prime_tokens.shape[1]
        base = max(P0 - 1, 0)
        if y.shape[1] < base + num_samples:
            raise ValueError(f"y covers {y.shape[1]} < {base + num_samples} "
                             f"steps (priming included)")
        # left-pad rf-1 zero-feature steps so a window ending at absolute
        # step s reads y_pad[:, s : s + rf] (zeros before sequence start)
        y_pad = jnp.pad(y.astype(jnp.float32),
                        ((0, 0), (rf - 1, 0), (0, 0)))

    def body(carry, i):
        window, c = carry
        nvalid = jnp.minimum(c, rf)            # valid MODEL positions
        mask = (pos >= rf - nvalid).astype(jnp.float32)        # [1, RF]
        mask = jnp.broadcast_to(mask, (batch, rf))
        y_win = None
        if y_pad is not None:
            y_win = jax.lax.dynamic_slice(
                y_pad, (0, base + i, 0),
                (batch, rf, y_pad.shape[2]))
        prev_extra = None                      # wider kernels: taps t-2..
        if Km1 > 1:                            # t-(K-1) from the window's
            prev_extra = jnp.stack(            # true history
                [window[:, Km1 - j:-j] for j in range(2, Km1 + 1)])
        logits = wn.forward_logits(params, cfg, window[:, Km1:],
                                   prev_tokens=window[:, Km1 - 1:-1],
                                   prev_tokens_extra=prev_extra,
                                   speaker=speaker,
                                   upsampled_cond=y_win,
                                   valid_mask=mask)[:, -1]     # [B, Q]
        k = jax.random.fold_in(key, i)
        # static-0 => greedy; traced temperatures keep the division path
        if isinstance(temperature, (int, float)) and temperature <= 0:
            nxt = jnp.argmax(logits, axis=-1)                  # greedy
        else:
            nxt = jax.random.categorical(k, logits / temperature, axis=-1)
        nxt = nxt.astype(jnp.int32)
        window = jnp.concatenate([window[:, 1:], nxt[:, None]], axis=1)
        return (window, jnp.minimum(c + 1, W)), nxt

    (_, _), samples = jax.lax.scan(body, (window, jnp.int32(c0)),
                                   jnp.arange(num_samples))
    return jnp.moveaxis(samples, 0, 1)


def tokens_to_waveform(tokens: jax.Array, cfg: WaveNetConfig) -> np.ndarray:
    return np.asarray(mulaw.decode(tokens, cfg.quantization_channels))


def batch_paths(out_path: str, batch: int):
    """out.wav -> [out_0.wav, ...] for batch > 1; robust to extensionless
    paths.  THE naming rule for batched wav output — the CLI and the
    library facade both use it so their filenames cannot diverge."""
    if batch == 1:
        return [out_path]
    import os
    root, ext = os.path.splitext(out_path)
    ext = ext or ".wav"
    return [f"{root}_{i}{ext}" for i in range(batch)]


def generate_wav(params: wn.Params, cfg: WaveNetConfig, out_path: str,
                 seconds: float, key: Optional[jax.Array] = None,
                 batch: int = 1, temperature: float = 1.0,
                 cond: Optional[jax.Array] = None,
                 **decode_kw) -> np.ndarray:
    """Sample `seconds` of audio with the fast decoder and write wav file(s).
    decode_kw (prime_tokens=, y=, speaker=, ...) pass through to
    generate_auto so conditioned models have a working wav entry point."""
    key = jax.random.PRNGKey(0) if key is None else key
    n = int(seconds * cfg.sample_rate)
    toks = generate_auto(params, cfg, key, num_samples=n, batch=batch,
                         cond=cond, temperature=temperature, **decode_kw)
    wave = tokens_to_waveform(toks, cfg)
    for i, path in enumerate(batch_paths(out_path, batch)):
        write_wav(path, wave[i], cfg.sample_rate)
    return wave
