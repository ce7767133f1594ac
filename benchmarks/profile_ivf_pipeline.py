"""Round-5 VERDICT #1: why does pipelined IVF lose to pipelined exact at
config5 (1M x 1024, nlist 4096) when it wins at 300k x 1024 (nlist 1024)?
Sweeps pipeline depth and nprobe at the exact config5 point, recording
dispatch-side blocking and device memory stats."""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROF_N", 1_000_000))
D = int(os.environ.get("PROF_D", 1024))
NLIST = int(os.environ.get("PROF_NLIST", 4096))

def hbm():
    import jax
    try:
        s = jax.devices()[0].memory_stats()
        return round(s.get("bytes_in_use", 0) / 1e9, 2)
    except Exception:
        return None

def main():
    import jax
    from minivectordb_tpu.vector_database import VectorDatabase

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((1000, D)).astype(np.float32) * 3
    mat = centers[rng.integers(0, 1000, N)] + rng.standard_normal((N, D)).astype(np.float32)
    path = "/tmp/prof_pipe.pkl"
    if os.path.exists(path):
        os.remove(path)
    db = VectorDatabase(storage_file=path, index="ivf", nlist=NLIST, nprobe=32,
                        ivf_opts={"iters": 6, "lists_dtype": "bfloat16",
                                  "build_threshold": 1})
    db._engine.load(mat, list(range(N)), [{} for _ in range(N)])
    del mat, centers
    t0 = time.perf_counter()
    db.find_most_similar(rng.standard_normal(D).astype(np.float32), k=1)
    print("build+first_search", round(time.perf_counter() - t0, 1), "hbm", hbm(), flush=True)

    big = np.tile(rng.standard_normal((64, D)).astype(np.float32), (16, 1))
    big_dev = jax.device_put(big); jax.block_until_ready(big_dev)
    out = {"hbm_resident_gb": hbm()}

    def pipelined(kind, depth, nprobe=None):
        db._engine.index_kind = "ivf" if kind == "ivf" else "flat"
        if nprobe: db.nprobe = nprobe
        db.find_most_similar_batch(big_dev, k=10)  # warm
        hs = [db.find_most_similar_batch_async(big_dev, k=10) for _ in range(2)]
        for h in hs: h.result()
        t0 = time.perf_counter()
        hs = []
        disp = []
        for _ in range(depth):
            td = time.perf_counter()
            hs.append(db.find_most_similar_batch_async(big_dev, k=10))
            disp.append(time.perf_counter() - td)
        for h in hs: h.result()
        qps = depth * 1024 / (time.perf_counter() - t0)
        return {"qps": round(qps), "disp_ms": [round(x*1e3,1) for x in disp],
                "hbm": hbm()}

    for np_ in (8, 32):
        for depth in (2, 4, 8, 16):
            out[f"ivf_np{np_}_d{depth}"] = pipelined("ivf", depth, np_)
            print(f"ivf np{np_} d{depth}:", out[f"ivf_np{np_}_d{depth}"], flush=True)
    for depth in (4, 16):
        out[f"exact_d{depth}"] = pipelined("exact", depth)
        print(f"exact d{depth}:", out[f"exact_d{depth}"], flush=True)
    print(json.dumps({k: (v if not isinstance(v, dict) else {kk: vv for kk, vv in v.items() if kk != 'disp_ms'}) for k, v in out.items()}, indent=1))

if __name__ == "__main__":
    main()
