#!/usr/bin/env python3
"""Export a model dir (config.json + vocab.json + model.safetensors) to
model.onnx — the analog of the reference's ONNX exporter
(/root/reference/scripts/export_ctc_model_to_onnx.py), with no torch/onnx
dependency: the graph is built by wav2vec2_tpu.onnx.export from the same
params pytree the XLA backend runs, so the two runtimes share weights by
construction. Output is f32 with dynamic batch/time axes (opset 17,
primitive ops only — loads in stock onnxruntime and in the embedded
evaluator).

Usage:
    python scripts/export_onnx_model.py --model-dir M [--out M/model.onnx]
        [--verify]   # run one random utterance through the embedded
                     # session and compare vs the JAX forward
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model-dir", required=True)
    p.add_argument("--out", default=None,
                   help="output path (default MODEL_DIR/model.onnx)")
    p.add_argument("--verify", action="store_true",
                   help="compare embedded-session logits vs the JAX forward "
                        "on one random utterance")
    args = p.parse_args(argv)

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import load_safetensors_params
    from wav2vec2_tpu.onnx import export_ctc_model, save_model

    model_dir = Path(args.model_dir)
    out = Path(args.out) if args.out else model_dir / "model.onnx"
    cfg = Wav2Vec2ModelConfig.load(model_dir / "config.json")
    params = load_safetensors_params(model_dir / "model.safetensors", cfg)

    t0 = time.perf_counter()
    model = export_ctc_model(cfg, params)
    save_model(out, model)
    size_mb = out.stat().st_size / 1e6
    print(f"[export_onnx] wrote {out} ({size_mb:.1f} MB, "
          f"{len(model.graph.nodes)} nodes) in "
          f"{time.perf_counter() - t0:.1f} s")

    if args.verify:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
        from wav2vec2_tpu.onnx import EmbeddedOnnxSession

        sess = EmbeddedOnnxSession(out)
        audio = np.random.default_rng(0).normal(
            size=(1, 16000)).astype(np.float32)
        (logits,) = sess.run(None, {"audio": audio})
        ref = np.asarray(wav2vec2_forward(params, jnp.asarray(audio), cfg))
        diff = float(np.abs(logits - ref).max())
        print(f"[export_onnx] verify: max|onnx - jax| = {diff:.2e}")
        if diff > 1e-3:
            print("[export_onnx] FAIL: logits diverge", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
