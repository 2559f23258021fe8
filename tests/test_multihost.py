"""Multi-host path (parallel/distributed.py + the Trainer multihost feed
branch): a REAL 2-process CPU process group via jax.distributed — VERDICT
r1 missing #5 ("the linear-scaling claim rests on unexecuted code").

Two subprocesses (2 local CPU devices each -> 4 global) bootstrap through
distributed.initialize, train 2 steps where each host feeds only its
local_batch_slice via make_array_from_process_local_data, and the result
must equal a single-process run on 4 virtual devices."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from wavenet_tpu.parallel import distributed


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_local_batch_slice_unit(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert distributed.local_batch_slice(8) == slice(4, 6)
    with pytest.raises(ValueError, match="not divisible"):
        distributed.local_batch_slice(6)


def test_local_batch_slices_partition(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    rows = []
    for i in range(2):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        sl = distributed.local_batch_slice(4)
        rows.extend(range(*sl.indices(4)))
    assert rows == [0, 1, 2, 3]


def _run_workers(tmp_path, mode):
    """Spawn the 2-process CPU pod and return the primary's result.npz."""
    port = free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
                             "XLA_FLAGS")}
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "WAVENET_MH_MODE": mode,
            "PYTHONPATH": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        })
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "_multihost_worker.py"),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return np.load(tmp_path / "result.npz")


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dp", "tp"])
def test_two_process_training_matches_single(tmp_path, mode):
    """mode=dp: pure data parallelism (VERDICT r1 #5).  mode=tp: Megatron
    channel sharding with the model axis inside a 2-process group — the
    cross-host compile of the per-layer and grad psums."""
    got = _run_workers(tmp_path, mode)

    # single-process reference: same cfg on 4 virtual devices (this test
    # process already runs with 8 forced CPU devices; use the first 4)
    from wavenet_tpu.audio.dataset import AudioDataset
    from wavenet_tpu.config import WaveNetConfig
    from wavenet_tpu.parallel.mesh import make_mesh
    from wavenet_tpu.training.trainer import Trainer
    par = (dict(data_parallel=2, model_parallel=2) if mode == "tp"
           else dict(data_parallel=4))
    cfg = WaveNetConfig(num_blocks=1, max_dilation=8, residual_channels=8,
                        skip_channels=8, compute_dtype="float32",
                        batch_size=4, train_window=128, **par)
    mesh = make_mesh(cfg, devices=jax.devices()[:4])
    ds = AudioDataset.synthetic(cfg, num_clips=2, clip_seconds=0.1)
    tr = Trainer(cfg, ds, mesh=mesh)
    m = tr.run(num_steps=2, log_every=0)
    ref = jax.device_get(tr.state.params)

    np.testing.assert_allclose(got["loss"], m["loss"], rtol=1e-5)
    np.testing.assert_allclose(got["w_cur"],
                               np.asarray(ref["w_cur"], np.float32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["head_w2"],
                               np.asarray(ref["head_w2"], np.float32),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_distributed_decode_matches_single(tmp_path):
    """Distributed AR generation across a REAL 2-process group (P3
    cross-host): per-layer conv-state psums and the token exchange run over
    the process boundary, and the counter RNG reproduces the single-process
    tokens at the same seed."""
    got = _run_workers(tmp_path, "decode")

    import jax
    from wavenet_tpu.config import WaveNetConfig
    from wavenet_tpu.models import wavenet as wn
    from wavenet_tpu.parallel import distdecode
    from wavenet_tpu.parallel.mesh import make_mesh
    cfg = WaveNetConfig(num_blocks=1, max_dilation=8, residual_channels=16,
                        skip_channels=16, compute_dtype="float32",
                        data_parallel=1, model_parallel=1)
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    mesh1 = make_mesh(cfg, devices=jax.devices()[:1])
    ref = distdecode.generate_sharded(params, cfg, mesh1, 5, num_samples=40,
                                      batch=2)
    np.testing.assert_array_equal(got["tokens"], np.asarray(ref))
