"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process CPU "pod".  Bootstraps through parallel/distributed.initialize
(the production seam), trains 2 steps through the Trainer's multihost
feed branch, and dumps final params from process 0."""

import os
import sys

import numpy as np


def main():
    out_dir = sys.argv[1]
    import jax
    from wavenet_tpu.parallel import distributed
    distributed.initialize()                    # from JAX_* env vars
    assert jax.process_count() == 2, jax.process_count()

    from wavenet_tpu.audio.dataset import AudioDataset
    from wavenet_tpu.config import WaveNetConfig
    from wavenet_tpu.training.trainer import Trainer

    mode = os.environ.get("WAVENET_MH_MODE", "dp")
    if mode == "decode":
        # distributed AR generation across a REAL process group: the
        # per-layer conv-state psum and the token exchange compile and run
        # cross-host; the counter RNG makes tokens identical to any
        # single-process layout at the same seed
        from wavenet_tpu.config import WaveNetConfig
        from wavenet_tpu.models import wavenet as wn
        from wavenet_tpu.parallel import distdecode
        from wavenet_tpu.parallel.mesh import make_mesh
        cfg = WaveNetConfig(num_blocks=1, max_dilation=8,
                            residual_channels=16, skip_channels=16,
                            compute_dtype="float32",
                            data_parallel=2, model_parallel=2)
        params = wn.init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(cfg)
        toks = distdecode.generate_sharded(params, cfg, mesh, 5,
                                           num_samples=40, batch=2)
        import jax.experimental.multihost_utils as mh
        toks = mh.process_allgather(toks, tiled=True)   # [B, N] global
        if distributed.is_primary():
            np.savez(os.path.join(out_dir, "result.npz"),
                     tokens=np.asarray(toks, np.int32))
        mh.sync_global_devices("done")
        print("worker ok", jax.process_index(), flush=True)
        return

    if mode == "tp":
        # Megatron channel sharding under a real process group: dp rows map
        # one-per-process (each host feeds its local_batch_slice), the model
        # axis shards every gated block's channels — the per-layer psum and
        # the grad psum both compile across the 2-process mesh
        par = dict(data_parallel=2, model_parallel=2)
    else:
        par = dict(data_parallel=len(jax.devices()))
    cfg = WaveNetConfig(num_blocks=1, max_dilation=8, residual_channels=8,
                        skip_channels=8, compute_dtype="float32",
                        batch_size=4, train_window=128, **par)
    ds = AudioDataset.synthetic(cfg, num_clips=2, clip_seconds=0.1)
    tr = Trainer(cfg, ds)
    m = tr.run(num_steps=2, log_every=0)

    if distributed.is_primary():
        params = jax.device_get(tr.state.params)
        np.savez(os.path.join(out_dir, "result.npz"),
                 loss=m["loss"],
                 w_cur=np.asarray(params["w_cur"], np.float32),
                 head_w2=np.asarray(params["head_w2"], np.float32))
    # all processes must stay alive until the primary finished writing
    import jax.experimental.multihost_utils as mh
    mh.sync_global_devices("done")
    print("worker ok", jax.process_index(), flush=True)


if __name__ == "__main__":
    main()
