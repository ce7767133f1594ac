"""Training checkpoint save/restore.

The reference's only checkpointing is the database pickle snapshot
(SURVEY.md §5); the encoder-training capability added here needs its own:
params + optimizer state + step counter serialize as a host-side numpy
pytree pickle (works for any of this package's param trees, survives device
/ sharding changes — arrays are re-placed on load).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0,
                    extra: dict | None = None) -> None:
    payload = {
        "params": _to_host(params),
        "opt_state": None if opt_state is None else _to_host(opt_state),
        "step": int(step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic on POSIX — a crash never corrupts the old


def load_checkpoint(path: str, shardings=None):
    """Returns (params, opt_state, step, extra). With `shardings` (a pytree
    of jax.sharding.Sharding matching params), arrays are placed directly
    into their multi-chip layout."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = payload["params"]
    if shardings is not None:
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, s), params, shardings,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )
    return params, payload["opt_state"], payload["step"], payload["extra"]
