"""Per-model-family throughput benchmark (bench.py's protocol, any preset).

Runs the full pipeline (forward → log-softmax → Viterbi → evidence → host
grouping) with bench.py's double-buffered, input-staged protocol for each
requested preset and prints one JSON line per model.

Usage:
    python scripts/bench_models.py [--models wavlm-base-plus,mms-1b]
        [--batch 64] [--repeats 8] [--audio-seconds 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

WORDS = ["THE", "QUICK", "BROWN", "FOX", "JUMPS", "OVER", "LAZY", "DOG",
         "WHILE", "SINGING", "ANCIENT", "MELODIES", "UNDER", "BRIGHT",
         "WINTER", "STARS", "NEAR", "FROZEN", "RIVERS", "TONIGHT"]


def bench_one(name: str, batch: int, repeats: int, audio_sec: float,
              flash: str = "auto") -> dict:
    """flash: 'auto' (shipping dispatch — the kernel fires only where
    measured faster), 'force' (WAV2VEC2_FLASH_FORCE: kernel wherever
    legal), 'off' (XLA attention everywhere) — the A/B lever behind
    reports/flash_ab_r5.jsonl."""
    import os

    import jax

    from wav2vec2_tpu.align.grouping import group_into_words
    from wav2vec2_tpu.align.grouping.path_to_words import FrameEvidence
    from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import PRESETS
    from wav2vec2_tpu.ops.flash_attention import FORCE_ENV
    from wav2vec2_tpu.parallel.batching import BatchAligner

    use_flash = {"auto": None, "force": True, "off": False}[flash]
    if flash == "force":
        os.environ[FORCE_ENV] = "1"
    else:
        os.environ.pop(FORCE_ENV, None)

    cfg = PRESETS[name](vocab_size=32)
    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    params = init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    aligner = BatchAligner(cfg, params, vocab, compute_dtype="bfloat16",
                           normalize_on_device=True,
                           use_flash_attention=use_flash)

    rng = np.random.default_rng(0)
    n = int(audio_sec * 16000)
    # CTC feasibility: T >= ceil(S/2). Coarse-frame heads (add_adapter at
    # 160 ms) can't fit the full 20-word transcript in audio_sec — cap the
    # word count to half the frame budget
    t_frames = cfg.conv_output_length(n)
    k = len(WORDS)
    while k > 1 and 2 * (1 + sum(len(w) + 1 for w in WORDS[:k]) * 2) > 2 * t_frames:
        k -= 1
    transcripts = [
        " ".join(rng.permutation(WORDS[:k])) for _ in range(batch)
    ]
    seqs = [build_token_sequence_case_aware(t, vocab, 0, 4) for t in transcripts]
    audio = (rng.normal(size=(batch, n)) * 4000).clip(-32768, 32767).astype(np.int16)
    tokens = np.zeros((batch, 256), np.int32)
    for j, s in enumerate(seqs):
        tokens[j, : len(s.tokens)] = s.tokens
    a_l = np.full(batch, n, np.int32)
    s_l = np.array([len(s.tokens) for s in seqs], np.int32)
    dev = [jax.device_put(x) for x in (audio, a_l, tokens, s_l)]
    jax.block_until_ready(dev)

    def submit():
        return aligner.submit_padded_batch(*dev)

    def drain(handles):
        paths, t_lens, emit, margin, blank = jax.device_get(handles[:5])
        for j, seq in enumerate(seqs):
            t_i = int(t_lens[j])
            ev = FrameEvidence(emit_lp=emit[j, :t_i], margin=margin[j, :t_i],
                               blank_prob=blank[j, :t_i].astype(np.float64))
            group_into_words(paths[j, :t_i], seq.tokens, seq.chars,
                             seq.normalized_words, ev, 0, 4,
                             cfg.frame_stride_ms(16000))

    for _ in range(3):
        drain(submit())
    t0 = time.perf_counter()
    inflight = submit()
    for _ in range(repeats - 1):
        nxt = submit()
        drain(inflight)
        inflight = nxt
    drain(inflight)
    total_s = time.perf_counter() - t0
    return {
        "metric": "model_family_throughput",
        "model": name,
        "params_m": round(n_params / 1e6, 1),
        "batch": batch,
        "audio_seconds_per_utt": audio_sec,
        "realtime_factor": round(repeats * batch * audio_sec / total_s, 1),
        "ms_per_batch": round(total_s / repeats * 1000, 1),
        "flash": flash,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--models",
                   default="wavlm-base-plus,data2vec-audio-base-960h,mms-1b",
                   help="comma list of presets, or 'all' for every family "
                        "at its standard bench batch (64 base / 32 large / "
                        "16 mms)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--mms-batch", type=int, default=16,
                   help="smaller batch for the 1B-param model")
    p.add_argument("--repeats", type=int, default=8)
    p.add_argument("--audio-seconds", type=float, default=10.0)
    p.add_argument("--emit-json", metavar="PATH",
                   help="also append each result line to this JSONL artifact "
                        "(e.g. reports/family_throughput.jsonl)")
    p.add_argument("--flash", choices=("auto", "force", "off"),
                   default="auto",
                   help="attention dispatch: shipping auto, force the "
                        "Pallas kernel everywhere legal, or XLA everywhere")
    args = p.parse_args(argv)

    from wav2vec2_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    if args.emit_json:
        # fail fast (and create the parent dir) BEFORE spending minutes of
        # TPU compile/bench time on the first model
        Path(args.emit_json).parent.mkdir(parents=True, exist_ok=True)
        with open(args.emit_json, "a", encoding="utf-8"):
            pass
    if args.models == "all":
        from wav2vec2_tpu.models.presets import PRESETS

        names = [n for n in PRESETS if n != "xlsr-53"]  # same geometry as
        # wav2vec2-large-960h-lv60 (only the vocab head differs)
    else:
        names = [m.strip() for m in args.models.split(",") if m.strip()]
    for name in names:
        if name.startswith("mms"):
            b = args.mms_batch
        elif "large" in name or "bert" in name or "conformer" in name:
            b = min(args.batch, 32)  # 600M-param geometries: bound f32
            # activation memory and pin the historical batch shape
        else:
            b = args.batch
        r = bench_one(name, b, args.repeats, args.audio_seconds,
                      flash=args.flash)
        print(json.dumps(r), flush=True)
        if args.emit_json:
            with open(args.emit_json, "a", encoding="utf-8") as f:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
