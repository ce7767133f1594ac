"""Training checkpoint save/restore + train_loop resume."""

import os
import uuid

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _batches(cfg, b=8, s=12, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (b, s), dtype=np.int32))
        yield {
            "q_ids": ids,
            "q_mask": jnp.ones((b, s), jnp.int32),
            "p_ids": ids,
            "p_mask": jnp.ones((b, s), jnp.int32),
        }


def test_checkpoint_roundtrip_and_resume(tmp_path):
    from minivectordb_tpu.models.checkpoint import load_checkpoint, save_checkpoint
    from minivectordb_tpu.models.encoder import EncoderConfig, init_params
    from minivectordb_tpu.models.train import train_loop

    cfg = EncoderConfig(vocab_size=128, hidden=32, layers=1, heads=4,
                        intermediate=64)
    params = init_params(cfg, seed=0)
    ckpt = str(tmp_path / "ck.pkl")

    it = _batches(cfg)
    params1, opt1, hist = train_loop(
        cfg, params, it, steps=4, checkpoint_path=ckpt, checkpoint_every=2,
        log_every=0,
    )
    assert os.path.exists(ckpt)

    loaded_params, loaded_opt, step, extra = load_checkpoint(ckpt)
    assert step == 4
    # loaded tree matches trained tree exactly
    flat1 = jax.tree.leaves(params1)
    flat2 = jax.tree.leaves(loaded_params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume continues without error and changes params
    params2, _, _ = train_loop(
        cfg, loaded_params, it, steps=2, start_step=step,
        opt_state=None, log_every=0,
    )
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params2), flat2)
    )


def test_checkpoint_atomic_overwrite(tmp_path):
    from minivectordb_tpu.models.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "c.pkl")
    save_checkpoint(path, {"w": np.ones(3)}, step=1)
    save_checkpoint(path, {"w": np.zeros(3)}, step=2)
    params, _, step, _ = load_checkpoint(path)
    assert step == 2
    np.testing.assert_array_equal(params["w"], np.zeros(3))
    assert not os.path.exists(path + ".tmp")
