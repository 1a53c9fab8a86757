#!/usr/bin/env python3
"""Export an HF wav2vec2 CTC checkpoint into a model dir for this framework.

The TPU-native replacement for the reference's ONNX exporter
(scripts/export_ctc_model_to_onnx.py): where the reference exports a second
runtime format with fp32/fp16/bf16/cuda-safe-fp16 precision variants, this
framework consumes safetensors directly, so export is: torch state_dict →
model.safetensors + config.json + vocab.json with a precision policy.

Precision policy (the reference's fp16-ONNX lesson, SURVEY.md §7: "pos-conv
stays f32" — obsidian fp16-onnx-cuda-incident.md):
  fp32          — everything float32
  bf16          — everything bfloat16 (storage; compute casts are dtype-safe)
  tpu-safe-bf16 — bf16 weights with the pos-conv embedding, all norms, and
                  the lm_head kept float32

The exported config.json carries a `dtype` field the builder reads
(config.rs:47-48 analog).

Usage:
    python scripts/export_hf_model.py --model facebook/wav2vec2-base-960h \
        --out models/wav2vec2_base_960h --precision fp32
    (offline: --model may be a local HF model directory)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

_F32_ISLANDS = ("pos_conv_embed", "layer_norm", "lm_head")


def precision_dtype(name: str, precision: str):
    import torch

    if precision == "fp32":
        return torch.float32
    if precision == "bf16":
        return torch.bfloat16
    if precision == "tpu-safe-bf16":
        if any(island in name for island in _F32_ISLANDS):
            return torch.float32
        return torch.bfloat16
    raise ValueError(f"unknown precision {precision!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="HF model id or local directory")
    p.add_argument("--out", required=True)
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16", "tpu-safe-bf16"])
    p.add_argument("--format", default="safetensors",
                   choices=["safetensors", "onnx"],
                   help="onnx additionally writes model.onnx for the "
                        "onnxruntime backend (requires the onnx package — "
                        "the reference exporter's dependency gate)")
    p.add_argument("--onnx-opset", type=int, default=14)
    p.add_argument("--target-lang", default=None,
                   help="for MMS adapter checkpoints (e.g. facebook/mms-1b-all): "
                        "merge this language's adapter + lm_head into the export")
    args = p.parse_args(argv)

    try:
        import torch
        import transformers
        from safetensors.numpy import save_file
    except ImportError as e:
        print(f"error: torch/transformers required for export: {e}",
              file=sys.stderr)
        return 1

    print(f"loading {args.model} ...", file=sys.stderr)
    # AutoModelForCTC covers the whole supported family (wav2vec2, HuBERT,
    # data2vec-audio, MMS); the loader normalizes the weight prefix
    # (models/params.py)
    kw = {"target_lang": args.target_lang} if args.target_lang else {}
    model = transformers.AutoModelForCTC.from_pretrained(args.model, **kw)
    model.eval()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    tensors = {}
    for name, tensor in model.state_dict().items():
        if name == "wav2vec2.masked_spec_embed":
            continue
        t = tensor.detach().to(precision_dtype(name, args.precision))
        arr = t.float().numpy() if t.dtype == torch.bfloat16 else t.numpy()
        if t.dtype == torch.bfloat16:
            # store as bf16 via ml_dtypes round-trip
            import ml_dtypes

            arr = arr.astype(ml_dtypes.bfloat16)
        tensors[name] = arr
    save_file(tensors, str(out_dir / "model.safetensors"))

    cfg = model.config.to_dict()
    cfg["dtype"] = {"fp32": "float32", "bf16": "bfloat16",
                    "tpu-safe-bf16": "bfloat16"}[args.precision]
    (out_dir / "config.json").write_text(json.dumps(cfg, indent=2))

    # copy sidecars (vocab/tokenizer) like the reference exporter does
    src = Path(args.model)
    if src.is_dir():
        for name in ("vocab.json", "tokenizer_config.json",
                     "special_tokens_map.json", "preprocessor_config.json"):
            if (src / name).exists():
                shutil.copy(src / name, out_dir / name)
    else:
        try:
            tok = transformers.Wav2Vec2CTCTokenizer.from_pretrained(args.model)
            vocab = tok.get_vocab()
            (out_dir / "vocab.json").write_text(json.dumps(vocab, indent=2))
        except Exception as e:
            print(f"warning: could not fetch vocab: {e}", file=sys.stderr)

    n_params = sum(int(np.prod(v.shape)) for v in tensors.values())
    print(f"exported {len(tensors)} tensors ({n_params/1e6:.1f}M params, "
          f"{args.precision}) to {out_dir}", file=sys.stderr)

    if args.format == "onnx":
        # the graph the onnxruntime backend consumes: [1, N] f32 audio ->
        # [1, T, V] logits (the reference's export_ctc_model_to_onnx.py
        # surface). torch's exporter needs the `onnx` package; gate it with
        # a clear error like the reference's feature flag.
        try:
            import onnx  # noqa: F401
        except ImportError:
            print("error: --format onnx requires the 'onnx' package "
                  "(pip install onnx); safetensors export above is complete",
                  file=sys.stderr)
            return 2
        example = torch.randn(1, 16000)
        torch.onnx.export(
            model, (example,), str(out_dir / "model.onnx"),
            input_names=["input_values"], output_names=["logits"],
            dynamic_axes={"input_values": {1: "samples"},
                          "logits": {1: "frames"}},
            opset_version=args.onnx_opset, dynamo=False,
        )
        print(f"exported ONNX graph to {out_dir / 'model.onnx'} "
              f"(opset {args.onnx_opset})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
