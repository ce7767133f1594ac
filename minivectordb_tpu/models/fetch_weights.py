"""Fetch + convert pretrained encoder weights into the runtime artifact.

The reference vendors its default ONNX model as package data
(reference setup.py:45-47) and pulls e5/bge-m3 from the HF hub at runtime
(reference embedding_model.py:55-60). Pretrained transformer weights are too
large to vendor in a wheel, so the packaging story here is a one-command
fetch that converts once into a self-contained directory:

    python -m minivectordb_tpu.models.fetch_weights --model small --out ./weights
    python -m minivectordb_tpu.models.fetch_weights --all --out ./weights
    export MINIVECTORDB_TPU_WEIGHTS=./weights

Each model lands in <out>/<kind>/ as params.npz + config.json + the HF
tokenizer files; EmbeddingModel then loads it with zero torch/transformers
involvement at inference time (models/convert.py:load_converted). Offline
machines can run the fetch anywhere with network access and copy the
directory across. ``--from-hf-cache`` converts from an already-populated
local HF cache without touching the network.
"""

from __future__ import annotations

import argparse
import os
import sys

from minivectordb_tpu.models import configs as model_configs

_KINDS = ("small", "large", "bgem3")


def fetch_one(kind: str, out_dir: str, local_only: bool = False) -> str:
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from minivectordb_tpu.models.convert import (
        config_from_hf,
        params_from_state_dict,
        save_converted,
    )

    hf_name = model_configs.HF_MODEL_NAMES[kind]
    dest = os.path.join(out_dir, kind)
    print(f"[fetch_weights] {kind}: {hf_name} -> {dest}", flush=True)
    hf_cfg = AutoConfig.from_pretrained(hf_name, local_files_only=local_only)
    model = AutoModel.from_pretrained(hf_name, local_files_only=local_only)
    cfg = config_from_hf(hf_cfg)
    params = params_from_state_dict(model.state_dict(), cfg)
    save_converted(params, cfg, dest)
    tok = AutoTokenizer.from_pretrained(hf_name, local_files_only=local_only)
    tok.save_pretrained(dest)
    print(f"[fetch_weights] wrote {dest} "
          f"({cfg.layers} layers, hidden {cfg.hidden})", flush=True)
    return dest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=_KINDS, help="which encoder slot")
    ap.add_argument("--all", action="store_true", help="fetch every slot")
    ap.add_argument("--out", default="./weights", help="artifact directory")
    ap.add_argument(
        "--from-hf-cache",
        action="store_true",
        help="convert from the local HF cache only (no network)",
    )
    args = ap.parse_args(argv)
    kinds = _KINDS if args.all else ([args.model] if args.model else [])
    if not kinds:
        ap.error("pass --model or --all")
    for kind in kinds:
        fetch_one(kind, args.out, local_only=args.from_hf_cache)
    print(
        f"[fetch_weights] done. export MINIVECTORDB_TPU_WEIGHTS="
        f"{os.path.abspath(args.out)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
