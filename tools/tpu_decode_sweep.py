"""Hardware sweep of the decode kernel's (batch_tile, time_chunk) plan and
VMEM budget — settles the rings-aliasing accounting question.

v5e VMEM is ~16 MiB/core.  _tile_bytes counts the rings input block AND the
aliased output block as BOTH live (the conservative reading after the
round-2 kernel review), which caps B=64 at four serialized bt=16 launches.
But the PRE-review bench ran bt=32 — 16.8 MiB of rings by that accounting —
under a 14 MiB vmem_limit without Mosaic rejection, strong evidence the
input_output_alias shares ONE VMEM buffer and the double-count costs a
hardware-proven 2x batch tile.  This tool raises the module budget (which
also raises the pallas_call vmem_limit), then for each candidate tiling:

  1. verifies tokens == interpret-mode (nonzero data, sampled t=1.0 — the
     Mosaic-miscompile gate; a tiling that is fast but wrong is useless);
  2. times a long free-running decode at the mandated B=64.

bt=32 BIT-EXACT + faster => revert _tile_bytes to single-count the aliased
rings (and keep the explicit j==0 copy note).  A Mosaic vmem-limit REJECTION
at bt=32 => the double-count is real; keep bt=16.

    python -u tools/tpu_decode_sweep.py [budget_mb=24] [steps=4096]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import numpy as np                                              # noqa: E402

from wavenet_tpu.config import fastgen_bench                    # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402
from wavenet_tpu.ops.pallas import decode as pdec               # noqa: E402


def main():
    budget_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    pdec.VMEM_BUDGET = budget_mb * 1024 * 1024   # before any decode trace
    cfg = fastgen_bench()
    B = 64
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    print(f"budget={budget_mb} MiB  B={B}  default plan(12MiB-era caps "
          f"lifted): {pdec.plan_tiles(cfg, B)}", flush=True)

    for bt in (16, 32, 64):
        for tc in (2048, 1024):
            need = pdec._tile_bytes(cfg, bt, tc)
            if need > pdec.VMEM_BUDGET:
                print(f"bt={bt} tc={tc}: skipped "
                      f"({need / 2**20:.1f} MiB > budget)", flush=True)
                continue
            try:
                # correctness first: sampled tokens vs interpret, short run
                hw = pdec.generate_pallas(p, cfg, key, 256, batch=B,
                                          temperature=1.0,
                                          force_tiles=(bt, tc))
                it = pdec.generate_pallas(p, cfg, key, 256, batch=B,
                                          temperature=1.0, interpret=True,
                                          force_tiles=(bt, tc))
                exact = np.array_equal(np.asarray(hw), np.asarray(it))
                np.asarray(pdec.generate_pallas(
                    p, cfg, key, steps, batch=B, temperature=1.0,
                    force_tiles=(bt, tc)))              # compile
                best = float("inf")
                for rep in range(3):
                    # readback-timed with a fresh key per rep:
                    # block_until_ready returns early on kernel outputs and
                    # the relay caches identical calls (BASELINE.md round 4)
                    t0 = time.perf_counter()
                    np.asarray(pdec.generate_pallas(
                        p, cfg, jax.random.fold_in(key, rep + 1), steps,
                        batch=B, temperature=1.0, force_tiles=(bt, tc)))
                    best = min(best, time.perf_counter() - t0)
                sps = steps / best
                print(f"bt={bt} tc={tc}: {'BIT-EXACT' if exact else 'WRONG'}"
                      f"  {sps:9.0f} steps/s  {sps * B / 1e6:6.2f} Msamples/s"
                      f"  ({need / 2**20:.1f} MiB)", flush=True)
            except Exception as e:  # noqa: BLE001 — report compile failures
                print(f"bt={bt} tc={tc}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
