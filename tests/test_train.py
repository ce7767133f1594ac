"""Encoder training: single-device and dp+tp-sharded contrastive step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_setup():
    from minivectordb_tpu.models.encoder import EncoderConfig, init_params

    cfg = EncoderConfig(vocab_size=256, hidden=32, layers=2, heads=4, intermediate=64)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    b, s = 8, 16
    batch = {
        "q_ids": jnp.asarray(rng.integers(4, 256, (b, s), dtype=np.int32)),
        "q_mask": jnp.asarray(np.ones((b, s), dtype=np.int32)),
        "p_ids": jnp.asarray(rng.integers(4, 256, (b, s), dtype=np.int32)),
        "p_mask": jnp.asarray(np.ones((b, s), dtype=np.int32)),
    }
    # make pairs learnable: passage i == query i
    batch["p_ids"] = batch["q_ids"]
    return cfg, params, batch


def test_train_step_reduces_loss_single_device():
    from minivectordb_tpu.models.train import init_training, make_train_step

    cfg, params, batch = _tiny_setup()
    params, opt_state, optimizer = init_training(cfg, params, learning_rate=1e-3)
    step = make_train_step(cfg, optimizer)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_train_step_sharded_matches_single_device_loss():
    from minivectordb_tpu.models.train import init_training, make_train_step
    from minivectordb_tpu.parallel.mesh import train_mesh

    cfg, params0, batch = _tiny_setup()

    # single-device reference
    params, opt_state, optimizer = init_training(cfg, jax.tree.map(jnp.copy, params0))
    step = make_train_step(cfg, optimizer)
    _, _, ref_metrics = step(params, opt_state, batch)
    ref_loss = float(ref_metrics["loss"])

    # dp x tp sharded
    mesh = train_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    params, opt_state, optimizer = init_training(cfg, params0, mesh=mesh)
    sstep = make_train_step(cfg, optimizer, mesh=mesh)
    _, _, metrics = sstep(params, opt_state, batch)
    assert abs(float(metrics["loss"]) - ref_loss) < 1e-4


def test_graft_entry_contracts():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 512)
    ge.dryrun_multichip(8)
