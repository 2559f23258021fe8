"""Bisect which sublane-axis aligned-concat patterns Mosaic can lower.

The train_stack fwd kernel's `concat(ring_ref_slice, x[:TT-d])` compiles and
is bit-exact; the bwd kernel with the same recipe fails to compile with
"result/input offset mismatch on non-concat dimension".  This probes each
concat shape in isolation:
  A. concat(ref2d[off:off+d], value[:TT-d])         (fwd ring pattern)
  B. concat(ref4d[0, 0, off:off+d], value[:TT-d])   (bwd snaps pattern)
  C. concat(value[d:], ref2d[off:off+d])            (bwd dz-ring pattern)
Run on TPU: python tools/tpu_concat_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TT, R, d, off = 512, 64, 32, 64


def run(tag, kernel, refs_shapes, args):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TT, R), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(refs_shapes)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        ref = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TT, R), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(refs_shapes)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True,
        )(*args)
        exact = bool(np.array_equal(np.asarray(out), np.asarray(ref)))
        print(f"{tag}: {'BIT-EXACT' if exact else 'WRONG DATA'}", flush=True)
    except Exception as e:
        print(f"{tag}: COMPILE FAIL {str(e)[:140]}", flush=True)


def kA(ring_ref, x_ref, o_ref):
    xp = jnp.concatenate([ring_ref[off:off + d], x_ref[:TT - d]], axis=0)
    o_ref[:] = xp * 2.0


def kB(snaps_ref, x_ref, o_ref):
    xp = jnp.concatenate([snaps_ref[0, 0, off:off + d], x_ref[:TT - d]],
                         axis=0)
    o_ref[:] = xp * 2.0


def kC(ring_ref, x_ref, o_ref):
    xp = jnp.concatenate([x_ref[:][d:], ring_ref[off:off + d]], axis=0)
    o_ref[:] = xp * 2.0


def kD(ring_ref, x_ref, o_ref):
    # value slice of a COMPUTED value (matmul-output-like), not a ref load
    v = x_ref[:] * 1.5
    xp = jnp.concatenate([v[d:], ring_ref[off:off + d]], axis=0)
    o_ref[:] = xp * 2.0


def main():
    assert jax.devices()[0].platform != "cpu"
    k = jax.random.PRNGKey(0)
    ring2 = jax.random.normal(k, (256, R), jnp.float32)
    snaps = jax.random.normal(k, (1, 1, 256, R), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (TT, R), jnp.float32)
    run("A ref2d+value", kA, 2, (ring2, x))
    run("B ref4d+value", kB, 2, (snaps, x))
    run("C value[d:]+ref2d", kC, 2, (ring2, x))
    run("D computed[d:]+ref2d", kD, 2, (ring2, x))


if __name__ == "__main__":
    main()
