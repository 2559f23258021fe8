import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def log(*a): print(*a, flush=True)

def kern(out_ref, acc):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] = acc[:] + 1.0
    out_ref[0, 0] = acc[:]

out = pl.pallas_call(
    kern,
    grid=(2, 4),
    out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, j: (bi, j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((2, 4, 8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
)()
log('2D grid (expect [[1,2,3,4],[1,2,3,4]]):')
log(np.asarray(out)[:, :, 0, 0])

# variant: ring-style — write scratch in tile j, read it in tile j+1 BEFORE writing
def kern2(out_ref, ring):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)
    out_ref[0, 0] = ring[:]               # read PREVIOUS tile's value
    ring[:] = ring[:] + (j + 1).astype(jnp.float32)

out2 = pl.pallas_call(
    kern2,
    grid=(1, 4),
    out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, j: (bi, j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 4, 8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
)()
log('ring read-before-write (expect [0,1,3,6]):', np.asarray(out2)[0, :, 0, 0])

# variant 3: partial-region store then full read (the rings pattern)
def kern3(out_ref, ring, buf):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)
    buf[:] = jnp.full((16, 128), (j + 1).astype(jnp.float32), jnp.float32)
    out_ref[0, 0] = ring[0:8]             # previous tile's stored rows
    ring[0:8] = buf[8:16]                 # aligned partial store from buf
out3 = pl.pallas_call(
    kern3,
    grid=(1, 4),
    out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, j: (bi, j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 4, 8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32),
                    pltpu.VMEM((16, 128), jnp.float32)],
)()
log('ref-slice ring (expect [0,1,2,3]):', np.asarray(out3)[0, :, 0, 0])
