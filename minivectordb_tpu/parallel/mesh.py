"""Device-mesh helpers.

The reference is single-process/single-node (SURVEY.md §2c: no NCCL/MPI/Gloo
anywhere); its "shards" are pickle files. Here the TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the corpus-row axis (search data parallelism)
and a 2-D (dp, tp) mesh for encoder training (parallel/../models/train.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


SHARD_AXIS = "shards"  # corpus-row partition axis (search DP)
DP_AXIS = "dp"  # batch axis (training)
TP_AXIS = "tp"  # hidden/head axis (training tensor parallelism)
DCN_AXIS = "dcn"  # host axis of a multi-host pod (data-center network)
ICI_AXIS = "ici"  # chip axis within a host (inter-chip interconnect)


def search_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices for sharded search."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def init_pod(coordinator_address: str, num_processes: int,
             process_id: int, local_device_ids=None) -> None:
    """Join a multi-host pod: one call per host process before any jax op.

    Thin, idempotent wrapper over ``jax.distributed.initialize`` — after it,
    ``jax.devices()`` spans every host and ``pod_mesh()`` builds its (dcn,
    ici) axes from real process boundaries instead of reshaping one
    process's chips. CPU-emulated two-process coverage:
    tests/test_multihost.py."""
    if jax.distributed.is_initialized():
        return  # idempotent (jax.process_count() here would init the backend)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def pod_mesh(n_hosts: int | None = None,
             chips_per_host: int | None = None) -> Mesh:
    """2-D (dcn, ici) mesh for multi-host pod search: the outer axis spans
    hosts (slow DCN links), the inner axis the chips of each host (fast
    ICI). parallel/dist_scan.py's hierarchical merge exploits the split:
    per-shard top-k lists merge over ICI first, so one k-wide candidate
    list per host (replicated per ICI position) crosses DCN instead of
    chips_per_host distinct lists (SURVEY.md §5: 'DCN enters only for
    multi-host scale-out')."""
    import numpy as np

    devices = jax.devices()
    if jax.process_count() > 1:
        # REAL pod (after init_pod): the dcn axis follows actual process
        # boundaries — rows are hosts, columns their local chips, so the
        # hierarchical merge's ici collectives never cross a host.
        by_proc: dict[int, list] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [sorted(v, key=lambda dd: dd.id)
                for _, v in sorted(by_proc.items())]
        n_hosts = n_hosts or len(rows)
        chips_per_host = chips_per_host or min(len(r) for r in rows[:n_hosts])
        if len(rows) < n_hosts:
            raise ValueError(f"need {n_hosts} hosts, have {len(rows)}")
        arr = np.asarray([r[:chips_per_host] for r in rows[:n_hosts]])
        return Mesh(arr, (DCN_AXIS, ICI_AXIS))
    if n_hosts is None:
        raise ValueError("n_hosts is required in a single-process pod emulation")
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    need = n_hosts * chips_per_host
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:need]).reshape(n_hosts, chips_per_host),
        (DCN_AXIS, ICI_AXIS),
    )


def train_mesh(n_devices: int | None = None, tp: int = 2) -> Mesh:
    """2-D (dp, tp) mesh for encoder training."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    while tp > 1 and n % tp != 0:
        tp //= 2
    import numpy as np

    return Mesh(np.asarray(devices).reshape(n // tp, tp), (DP_AXIS, TP_AXIS))
