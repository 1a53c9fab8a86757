"""OnlineAligner word-finalization latency (VERDICT r2 item 8).

Measures the serving-relevant metric for live alignment: how long after a
word has been SPOKEN (its audio fully pushed) does it come back finalized?

Protocol: simulate a live feed pushing `--push-ms` of audio at a time into
a warmed OnlineAligner; on every push, record for each newly finalized
word:

    latency = (stream position after this push) - (word end time)
              + (wall-clock time of this push call)

The first term is the STRUCTURAL latency (finalization margin + window
cadence — what the knobs control); the second is the compute the caller
actually waits on (window forwards amortized over pushes). Reported:
p50/p90/max total latency, structural vs compute split, and per-push wall
stats. Defaults mirror the daemon's /stream defaults (5 s windows, 1 s
overlap, 2 s margin).

Run: python scripts/online_latency.py [--model full|tiny]
     [--seconds 120] [--push-ms 250] [--chunk-sec 5] [--margin-sec 2]
Prints one JSON line.
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


def _trained_tone_stream(seconds: float):
    """Train the tiny tone model (the train→align e2e recipe) and build a
    long tone stream with a matching transcript. Returns
    (cfg, trained_params, audio, transcript)."""
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    sr = 16000
    char_n = 1600
    tones = {1: 440.0, 2: 880.0, 4: 1320.0, 5: 1760.0}
    id2ch = {1: "a", 2: "b", 4: "c", 5: "d"}
    cfg = Wav2Vec2ModelConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=96, conv_dim=[24, 24], conv_kernel=[10, 4],
        conv_stride=[5, 4], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    rng = np.random.default_rng(0)

    def synth_words(n_words):
        wav, words = [], []
        for _ in range(n_words):
            seq = list(rng.choice([1, 2, 4, 5], size=int(rng.integers(2, 4))))
            for lid in seq:
                wav.append(
                    0.3 * np.sin(2 * np.pi * tones[lid]
                                 * np.arange(char_n) / sr)
                    + rng.normal(size=char_n) * 0.01
                )
            words.append("".join(id2ch[l] for l in seq))
            sil = int(rng.integers(800, 2400))
            wav.append(rng.normal(size=sil) * 0.01)
        return np.concatenate(wav).astype(np.float32), words

    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(learning_rate=2e-3)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    n_pad = 24000
    for _ in range(120):
        audio_b = np.zeros((8, n_pad), np.float32)
        a_l = np.zeros(8, np.int32)
        labels = np.zeros((8, 16), np.int32)
        l_l = np.zeros(8, np.int32)
        for i in range(8):
            w, words = synth_words(int(rng.integers(2, 4)))
            w = w[:n_pad]
            audio_b[i, : len(w)] = w / max(w.std(), 1e-6)
            a_l[i] = len(w)
            flat = []
            for word in words:
                flat += [{"a": 1, "b": 2, "c": 4, "d": 5}[c] for c in word]
                flat.append(3)
            flat = flat[:-1][:16]
            labels[i, : len(flat)] = flat
            l_l[i] = len(flat)
        state, _loss = step(state, *map(jnp.asarray,
                                        (audio_b, a_l, labels, l_l)))

    pieces, words = [], []
    total = 0
    while total < seconds * sr:
        w, ws = synth_words(4)
        pieces.append(w)
        words.extend(ws)
        total += len(w)
    stream = np.concatenate(pieces)
    transcript = " ".join(words)
    return cfg, jax.device_get(state.params), stream, transcript


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="full",
                   choices=["full", "tiny", "trained-tones"])
    p.add_argument("--seconds", type=float, default=120.0)
    p.add_argument("--push-ms", type=float, default=250.0)
    p.add_argument("--chunk-sec", type=float, default=5.0)
    p.add_argument("--overlap-sec", type=float, default=1.0)
    p.add_argument("--margin-sec", type=float, default=2.0)
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax

    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params

    if args.model == "full":
        cfg = Wav2Vec2ModelConfig.from_dict(dict(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_dim=[512] * 7,
            conv_kernel=[10, 3, 3, 3, 3, 2, 2],
            conv_stride=[5, 2, 2, 2, 2, 2, 2],
            num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
            pad_token_id=0, vocab_size=32, do_stable_layer_norm=False,
            feat_extract_norm="group", conv_bias=False,
        ))
    else:
        cfg = Wav2Vec2ModelConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
            feat_extract_norm="group", conv_bias=False,
        )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    rng = np.random.default_rng(0)
    n = int(args.seconds * 16000)
    if args.model == "trained-tones":
        # Random weights place word ends arbitrarily within the band, so
        # in-order emission head-of-line blocks behind late words and the
        # measured latency reflects alignment CONTENT, not the serving
        # mechanism. Training the tiny model on synthetic tones pins word
        # ends to the audio — the latency then measures what a production
        # stream (real speech + trained checkpoint) sees.
        cfg, params, audio, transcript = _trained_tone_stream(args.seconds)
        n = len(audio)
        vocab = {"<pad>": 0, "a": 1, "b": 2, "|": 3, "c": 4, "d": 5}
    else:
        audio = rng.normal(size=n).astype(np.float32)
        words = [
            "".join(rng.choice(list("ETAONIHSRD"),
                               size=int(rng.integers(2, 7))))
            for _ in range(int(args.seconds * 2))
        ]
        transcript = " ".join(words)

    sess = OnlineAligner(
        cfg, params, vocab, transcript,
        chunk_sec=args.chunk_sec, overlap_sec=args.overlap_sec,
        finalize_margin_sec=args.margin_sec,
        compute_dtype=args.compute_dtype,
    )
    t0 = time.perf_counter()
    sess.warmup()
    warmup_s = time.perf_counter() - t0

    push = int(args.push_ms * 16)
    latencies, structural, push_walls = [], [], []
    pos = 0
    while pos < n:
        piece = audio[pos : pos + push]
        pos += len(piece)
        t0 = time.perf_counter()
        new_words = sess.push(piece)
        wall = time.perf_counter() - t0
        push_walls.append(wall)
        stream_sec = pos / 16000.0
        for w in new_words:
            structural.append(stream_sec - w.end_ms / 1000.0)
            latencies.append(structural[-1] + wall)
    out = sess.flush()

    def dist(xs):
        if not xs:
            return {}
        xs = np.asarray(xs)
        return {"p50": round(float(np.percentile(xs, 50)), 3),
                "p90": round(float(np.percentile(xs, 90)), 3),
                "max": round(float(xs.max()), 3)}

    print(json.dumps({
        "metric": "online_word_finalization_latency_s",
        "model": args.model,
        "stream_seconds": args.seconds,
        "push_ms": args.push_ms,
        "chunk_sec": args.chunk_sec,
        "overlap_sec": args.overlap_sec,
        "finalize_margin_sec": args.margin_sec,
        "words_streamed": len(latencies),
        "words_total": len(out.words),
        "latency_s": dist(latencies),
        "structural_s": dist(structural),
        "push_wall_s": dist(push_walls),
        "warmup_s": round(warmup_s, 1),
        "realtime_ok": bool(np.sum(push_walls) < args.seconds),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
