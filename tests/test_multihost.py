"""Two-process pod search on emulated CPU hosts (round-3, VERDICT #8).

Spawns 2 REAL processes, each with 4 virtual CPU devices. Both join a pod
via jax.distributed (gloo CPU collectives), build a (2, 4) pod_mesh from the
true process boundaries, contribute disjoint halves of the corpus with
``PodScanIndex.load_local`` (make_array_from_process_local_data — a host's
rows never leave it), and run the hierarchical search; every process must
report the brute-force oracle's ids.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import sys, os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, {repo!r})

pid = int(sys.argv[1]); port = int(sys.argv[2])
from minivectordb_tpu.parallel.multihost import init_pod, pod_mesh, PodScanIndex

init_pod(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = pod_mesh()
assert mesh.devices.shape == (2, 4), mesh.devices.shape
assert mesh.axis_names == ("dcn", "ici")
# every row of the mesh must be one process's devices
for r in range(2):
    assert len({{d.process_index for d in mesh.devices[r]}}) == 1

n, d, k = 1000, 32, 8
rng = np.random.default_rng(0)
mat = rng.standard_normal((n, d)).astype(np.float32)

idx = PodScanIndex(mesh, d)
per_host = 1024 // 2
lo, hi = pid * per_host, min(n, (pid + 1) * per_host)
idx.load_local(mat[lo:hi], pid * per_host, n)

q = mat[:4] + 0.01
vals, gids = idx.search(q, k)

qn = q / np.linalg.norm(q, axis=1, keepdims=True)
scores = (qn @ mat.T) / np.linalg.norm(mat, axis=1)
oracle = np.argsort(-scores, axis=1)[:, :k]
assert (gids == oracle).all(), (gids, oracle)
print(f"proc{{pid}} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.timeout(300)
def test_two_process_pod_search_matches_oracle(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "pod_child.py"
    script.write_text(_CHILD.format(repo=repo))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pod child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out
