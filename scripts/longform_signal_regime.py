"""Signal-regime long-form stitching validation (trained tones).

Replaces the no-signal-regime caveat (random weights at 3 min gave p50
44.6 s because unanchored boundaries move with attention context): here a
stride-320 (20 ms frame — the real wav2vec2 rate) CONV-ONLY tones model
(num_hidden_layers=0) is TRAINED so emissions are local, translation-
invariant and acoustically pinned — separating the stitching contract from
model context-robustness (an attention model trained at clip scale drifts
at stream scale because global attention makes emissions depend on the
visible window; measured in BENCHMARKS.md — the chunker MITIGATES that).
Minute-scale streams with known ground truth are then aligned:

  * 3 min — chunked-stitched (30 s / 5 s) vs the unchunked single forward:
    gate >=95% of words within one frame stride on both edges (the
    single-forward guarantee the chunker replaces, reference
    runtime.rs:116-121), plus chunked vs ground truth.
  * 10 min — unchunked attention is O(T^2) ~ 30k frames (the regime the
    chunker EXISTS for), so the gates are chunked vs ground truth and
    piece-size independence (30 s / 5 s vs 12 s / 3 s chunking agree).

Writes reports/longform_signal_regime.json and prints a markdown table.

Usage:
    python scripts/longform_signal_regime.py [--steps 400] [--cpu]
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

SR = 16000
CHAR_N = 3200  # 200 ms per tone "phoneme" = 10 frames at 20 ms
N_PAD = 48000  # 3 s training clips
TONES = {1: 440.0, 2: 880.0, 4: 1320.0, 5: 1760.0}
ID2CH = {1: "a", 2: "b", 4: "c", 5: "d"}
VOCAB = {"a": 1, "b": 2, "|": 3, "c": 4, "d": 5}


def tiny_cfg():
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig

    return Wav2Vec2ModelConfig(
        hidden_size=48, num_hidden_layers=0, num_attention_heads=2,
        intermediate_size=96, conv_dim=[24, 24, 24, 24],
        conv_kernel=[10, 4, 4, 4], conv_stride=[5, 4, 4, 4],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )


def synth_word(word, rng):
    segs = []
    for lid in word:
        segs.append(
            0.3 * np.sin(2 * np.pi * TONES[lid] * np.arange(CHAR_N) / SR)
            + rng.normal(size=CHAR_N) * 0.01
        )
    return np.concatenate(segs)


def train(cfg, steps, rng):
    import jax
    import jax.numpy as jnp
    import optax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.train import init_train_state, make_train_step

    def make_batch(bs):
        audio = np.zeros((bs, N_PAD), np.float32)
        a_l = np.zeros(bs, np.int32)
        labels = np.zeros((bs, 16), np.int32)
        l_l = np.zeros(bs, np.int32)
        for i in range(bs):
            s = [
                list(rng.choice([1, 2, 4, 5], size=int(rng.integers(2, 4))))
                for _ in range(int(rng.integers(2, 4)))
            ]
            # random leading silence breaks absolute-position cues
            parts = [rng.normal(size=int(rng.integers(0, 4800))) * 0.01]
            flat = []
            for word in s:
                parts.append(synth_word(word, rng))
                parts.append(rng.normal(size=int(rng.integers(1600, 4800)))
                             * 0.01)
                flat.extend(word + [3])
            w = np.concatenate(parts)[:N_PAD]
            audio[i, : len(w)] = w / max(w.std(), 1e-6)
            a_l[i] = len(w)
            flat = flat[:-1][:16]
            labels[i, : len(flat)] = flat
            l_l[i] = len(flat)
        return audio, a_l, labels, l_l

    params = init_params(cfg, jax.random.PRNGKey(0))
    sched = optax.warmup_cosine_decay_schedule(0.0, 3e-3, steps // 10, steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=0.01))
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    first = last = None
    for i in range(steps):
        state, loss = step(state, *map(jnp.asarray, make_batch(8)))
        if first is None:
            first = float(loss)
        last = float(loss)
        if i % 40 == 0:
            print(f"[train] step {i} loss {float(loss):.2f}",
                  file=sys.stderr, flush=True)
    if last >= first / 20:
        raise SystemExit(f"training failed to converge: {first} -> {last}")
    return jax.device_get(state.params)


def synth_stream(rng, seconds):
    wav, words, bounds, t = [], [], [], 0
    target = int(seconds * SR)
    wav.append(rng.normal(size=3200) * 0.01)
    t += 3200
    while t < target:
        word = list(rng.choice([1, 2, 4, 5], size=int(rng.integers(2, 5))))
        start = t
        seg = synth_word(word, rng)
        wav.append(seg)
        t += len(seg)
        bounds.append((start, t))
        words.append("".join(ID2CH[l] for l in word))
        sil = int(rng.integers(1600, 4800))
        wav.append(rng.normal(size=sil) * 0.01)
        t += sil
    return (np.concatenate(wav).astype(np.float32),
            " ".join(words), bounds)


def word_deltas(a, b):
    assert [w.word for w in a.words] == [w.word for w in b.words]
    return [
        max(abs(x.start_ms - y.start_ms), abs(x.end_ms - y.end_ms))
        for x, y in zip(a.words, b.words)
    ]


def truth_stats(out, bounds):
    errs = [abs(w.start_ms - s0 / 16) for w, (s0, _) in zip(out.words, bounds)]
    errs += [abs(w.end_ms - s1 / 16) for w, (_, s1) in zip(out.words, bounds)]
    return {
        "p50_ms": round(float(np.median(errs)), 1),
        "p99_ms": round(float(np.percentile(errs, 99)), 1),
        "max_ms": round(float(np.max(errs)), 1),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="reports/longform_signal_regime.json")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from wav2vec2_tpu.align.longform import align_longform

    cfg = tiny_cfg()
    rng = np.random.default_rng(11)
    t0 = time.perf_counter()
    params = train(cfg, args.steps, rng)
    print(f"[train] done in {time.perf_counter() - t0:.0f} s",
          file=sys.stderr)
    stride_ms = cfg.frame_stride_ms(SR)
    result = {"metric": "longform_signal_regime",
              "frame_stride_ms": stride_ms, "regimes": {}}

    # --- 3 min: chunked vs unchunked single forward + vs truth
    audio, transcript, bounds = synth_stream(rng, 180.0)
    t0 = time.perf_counter()
    full = align_longform(audio, transcript, params, cfg, VOCAB,
                          chunk_sec=300.0)  # single forward
    chunked = align_longform(audio, transcript, params, cfg, VOCAB,
                             chunk_sec=30.0, overlap_sec=5.0)
    deltas = word_deltas(full, chunked)
    within = sum(d <= stride_ms for d in deltas) / len(deltas)
    result["regimes"]["3min"] = {
        "words": len(deltas),
        "vs_unchunked_within_one_frame_pct": round(100 * within, 1),
        "vs_unchunked_p50_ms": round(float(np.median(deltas)), 1),
        "vs_unchunked_max_ms": round(float(np.max(deltas)), 1),
        "chunked_vs_truth": truth_stats(chunked, bounds),
        "unchunked_vs_truth": truth_stats(full, bounds),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(f"[3min] {json.dumps(result['regimes']['3min'])}",
          file=sys.stderr, flush=True)
    if within < 0.95:
        raise SystemExit(
            f"3min stitching gate FAILED: {100 * within:.1f}% within one "
            f"frame (< 95%)"
        )

    # --- 10 min: chunked vs truth + piece-size independence
    audio, transcript, bounds = synth_stream(rng, 600.0)
    t0 = time.perf_counter()
    c30 = align_longform(audio, transcript, params, cfg, VOCAB,
                         chunk_sec=30.0, overlap_sec=5.0)
    c12 = align_longform(audio, transcript, params, cfg, VOCAB,
                         chunk_sec=12.0, overlap_sec=3.0)
    deltas = word_deltas(c30, c12)
    within = sum(d <= stride_ms for d in deltas) / len(deltas)
    result["regimes"]["10min"] = {
        "words": len(deltas),
        "piece_size_within_one_frame_pct": round(100 * within, 1),
        "piece_size_max_ms": round(float(np.max(deltas)), 1),
        "chunked_vs_truth": truth_stats(c30, bounds),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(f"[10min] {json.dumps(result['regimes']['10min'])}",
          file=sys.stderr, flush=True)
    if within < 0.95:
        raise SystemExit(
            f"10min piece-size gate FAILED: {100 * within:.1f}% (< 95%)"
        )

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))

    r3, r10 = result["regimes"]["3min"], result["regimes"]["10min"]
    print("\n| stream | words | vs unchunked ≤1 frame | vs truth p50/p99/max"
          " (ms) | piece-size ≤1 frame |")
    print("|---|---|---|---|---|")
    t3 = r3["chunked_vs_truth"]
    print(f"| 3 min (30 s/5 s) | {r3['words']} "
          f"| {r3['vs_unchunked_within_one_frame_pct']}% "
          f"| {t3['p50_ms']} / {t3['p99_ms']} / {t3['max_ms']} | — |")
    t10 = r10["chunked_vs_truth"]
    print(f"| 10 min (30 s/5 s) | {r10['words']} | — "
          f"| {t10['p50_ms']} / {t10['p99_ms']} / {t10['max_ms']} "
          f"| {r10['piece_size_within_one_frame_pct']}% |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
