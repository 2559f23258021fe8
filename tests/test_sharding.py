"""Sharding/collective tests on the 8-device virtual CPU mesh
(SURVEY.md §4 "Distributed without a cluster").

Numerical invariant everywhere: sharded loss/grads/logits == single-device
results, for data parallel (P1), tensor/model parallel (P2), and combinations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.parallel import sharding as shd
from wavenet_tpu.parallel.mesh import make_mesh
from wavenet_tpu.training.trainer import Trainer, make_optimizer, make_train_step
from wavenet_tpu.audio.dataset import AudioDataset


def cfg_(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=16,
                skip_channels=16, compute_dtype="float32",
                batch_size=8, train_window=128)
    base.update(kw)
    return WaveNetConfig(**base)


def _loss_and_grads(cfg, p, toks):
    return jax.value_and_grad(lambda p: wn.loss_fn(p, cfg, toks)[0])(p)


def _sharded_loss_and_grads(cfg, p, toks, mesh):
    pshard = shd.param_shardings(cfg, mesh)
    tshard = shd.batch_shardings(mesh, with_mel=False)["tokens"]
    p_s = jax.device_put(p, pshard)
    t_s = jax.device_put(toks, tshard)
    f = jax.jit(lambda p, t: _loss_and_grads(cfg, p, t),
                in_shardings=(pshard, tshard),
                out_shardings=None)
    return f(p_s, t_s)


@pytest.mark.parametrize("dp,sp,mp", [(8, 1, 1), (1, 1, 8), (2, 1, 4), (4, 1, 2)])
def test_sharded_grads_match_single_device(dp, sp, mp):
    cfg = cfg_(data_parallel=dp, seq_parallel=sp, model_parallel=mp)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 256)

    ref_loss, ref_grads = _loss_and_grads(cfg, p, toks)
    loss, grads = _sharded_loss_and_grads(cfg, p, toks, mesh)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree.flatten_with_path(ref_grads)[0],
            jax.tree.flatten_with_path(grads)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=str(ka))


def test_sharded_forward_matches():
    cfg = cfg_(model_parallel=8, data_parallel=1)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 100), 0, 256)
    ref = wn.forward_logits(p, cfg, toks)
    pshard = shd.param_shardings(cfg, mesh)
    p_s = jax.device_put(p, pshard)
    got = jax.jit(lambda p, t: wn.forward_logits(p, cfg, t))(p_s, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_trainer_on_mesh_matches_single_device():
    """3 optimizer steps on a 2x1x4 mesh == 3 steps on 1 device."""
    cfg = cfg_(data_parallel=2, model_parallel=4, batch_size=4,
               learning_rate=1e-3)
    ds = AudioDataset.synthetic(cfg, num_clips=2, clip_seconds=0.2)

    tr_mesh = Trainer(cfg, ds)
    tr_mesh.run(num_steps=3, log_every=0)

    cfg1 = cfg.replace(data_parallel=1, model_parallel=1)
    tr_one = Trainer(cfg1, ds, mesh=make_mesh(cfg1, jax.devices()[:1]))
    tr_one.run(num_steps=3, log_every=0)

    pa = jax.device_get(tr_mesh.state.params)
    pb = jax.device_get(tr_one.state.params)
    for (ka, a), (kb, b) in zip(
            jax.tree.flatten_with_path(pa)[0],
            jax.tree.flatten_with_path(pb)[0]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4, err_msg=str(ka))


def test_sharded_decode_matches():
    """Model-parallel fast decode == single-device fast decode (P3 precursor:
    queues sharded on channels, logits replicated)."""
    cfg = cfg_(model_parallel=8)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 30), 0, 256)

    def fast(p, toks):
        st = wn.decode_init(cfg, 2)
        def body(st, tok):
            st, lg = wn.decode_step(p, cfg, st, tok)
            return st, lg
        _, lgs = jax.lax.scan(body, st, jnp.moveaxis(toks, 1, 0))
        return jnp.moveaxis(lgs, 0, 1)

    ref = fast(p, toks)
    pshard = shd.param_shardings(cfg, mesh)
    p_s = jax.device_put(p, pshard)
    got = jax.jit(fast)(p_s, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generate_sharded_runs():
    cfg = cfg_(model_parallel=4, data_parallel=2)
    mesh = make_mesh(cfg)
    p = jax.device_put(wn.init_params(cfg, jax.random.PRNGKey(0)),
                       shd.param_shardings(cfg, mesh))
    out = wn.generate(p, cfg, jax.random.PRNGKey(5), num_samples=20, batch=8)
    assert out.shape == (8, 20)
