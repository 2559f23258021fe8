"""Hardware-vs-interpret check for LANE-axis value ops used by the fused
training kernels' MXU K/N-fusion (round 2):

  A) z = concat([a, b], axis=1) @ w       (lane concat at offset 64, bf16)
  B) o = h @ w_rs; o[:, :64] and o[:, 64:] (lane slices of an f32 value)
  C) f32 lane concat (the backward's dcat = [dx | dskip])

Round 1 established Mosaic miscompiles several SUBLANE-misaligned patterns
(docs/ARCHITECTURE.md §3); lane-axis behavior needed its own proof before
kernel surgery.  Run: python -u tools/tpu_lane_ops_check.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_a(a_ref, b_ref, w_ref, o_ref):
    cat = jnp.concatenate([a_ref[:], b_ref[:]], axis=1)       # [T, 128] bf16
    o_ref[:] = jnp.dot(cat, w_ref[:], preferred_element_type=jnp.float32)


def kernel_b(h_ref, w_ref, o1_ref, o2_ref):
    o = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    o1_ref[:] = o[:, :64] * 2.0 + 1.0
    o2_ref[:] = o[:, 64:] * 3.0 - 1.0


def kernel_c(x_ref, y_ref, w_ref, o_ref):
    cat = jnp.concatenate([x_ref[:], y_ref[:]], axis=1)       # [T, 128] f32
    o_ref[:] = jax.lax.dot_general(
        cat, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # contract lanes


def run(kernel, ins, n_out, interpret):
    outs = tuple(jax.ShapeDtypeStruct((ins[0].shape[0], 64), jnp.float32)
                 for _ in range(n_out))
    if n_out == 1:
        outs = outs[0]
    return pl.pallas_call(kernel, out_shape=outs,
                          interpret=interpret)(*ins)


def check(name, kernel, ins, n_out=1):
    hw = run(kernel, ins, n_out, False)
    it = run(kernel, ins, n_out, True)
    hw = hw if isinstance(hw, tuple) else (hw,)
    it = it if isinstance(it, tuple) else (it,)
    ok = True
    for i, (h, r) in enumerate(zip(hw, it)):
        h, r = np.asarray(h), np.asarray(r)
        same = np.array_equal(h, r)
        ok &= same
        if not same:
            d = np.abs(h - r)
            bad = np.argwhere(h != r)
            print(f"  out{i}: MISMATCH max={d.max():.3e} "
                  f"n={len(bad)} first={bad[:3].tolist()}")
    print(f"{name}: {'BIT-EXACT' if ok else 'FAIL'}")
    return ok


def main():
    T = 256
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    a = jax.random.normal(ks[0], (T, 64), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(ks[1], (T, 64), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(ks[2], (128, 64), jnp.float32).astype(jnp.bfloat16)
    h = jax.random.normal(ks[3], (T, 64), jnp.float32).astype(jnp.bfloat16)
    wrs = jax.random.normal(ks[4], (64, 128), jnp.float32).astype(jnp.bfloat16)
    xf = jax.random.normal(ks[0], (T, 64), jnp.float32)
    yf = jax.random.normal(ks[1], (T, 64), jnp.float32)
    wf = jax.random.normal(ks[5], (64, 128), jnp.float32)

    ok = True
    ok &= check("A lane-concat bf16 -> matmul", kernel_a, (a, b, w))
    ok &= check("B f32 value lane-slices of matmul", kernel_b, (h, wrs),
                n_out=2)
    ok &= check("C lane-concat f32 -> contract-lanes dot", kernel_c,
                (xf, yf, wf))
    print("ALL OK" if ok else "FAILURES — do not ship the fusion")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
