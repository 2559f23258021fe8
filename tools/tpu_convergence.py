"""Fused vs scan: train 300 steps each on the same data; compare loss curves."""
import jax, jax.numpy as jnp, numpy as np, time
from wavenet_tpu.config import small
from wavenet_tpu.audio.dataset import AudioDataset
from wavenet_tpu.training.trainer import Trainer
from wavenet_tpu.parallel.mesh import make_mesh
def log(*a): print(*a, flush=True)

for fused in (True, False):
    cfg = small().replace(fused_stack=fused, batch_size=8)
    ds = AudioDataset.synthetic(cfg, num_clips=4, clip_seconds=2.0)
    tr = Trainer(cfg, ds)
    m = tr.run(num_steps=300, log_every=0)
    log(f'fused={fused}: loss300={m["loss"]:.4f} acc={m["accuracy"]:.3f} '
        f'steps/s={m["steps_per_sec"]:.1f}')
