import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def log(*a): print(*a, flush=True)

def kern(out_ref, acc):
    j = pl.program_id(0)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] = acc[:] + 1.0
    out_ref[0] = acc[:]

out = pl.pallas_call(
    kern,
    grid=(4,),
    out_specs=pl.BlockSpec((1, 8, 128), lambda j: (j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
)()
log('scratch persistence (expect 1,2,3,4):', np.asarray(out)[:, 0, 0])
