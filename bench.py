"""Benchmark: end-to-end batched forced alignment throughput on one chip.

Metric: real-time factor (audio-seconds aligned per wall-clock second per
chip) through the full pipeline — wav2vec2-base forward (bf16) →
log-softmax → fused Pallas Viterbi → device evidence extraction → host
grouping/confidence — on 128 × 10 s utterances per batch, double-buffered
(submit/drain) so host grouping and readback overlap device compute. Random weights (no
checkpoints in this environment); compute shape/work is identical to real
weights.

Methodology mirrors the reference benchmark protocol (BENCHMARKS.md:306-312
+ the `AlignmentInput::normalized` input cache, types.rs:6-7): audio is
staged on device ONCE, then warmup + timed repeats measure steady-state
alignment work — device compute, T-length result readback, and host
grouping — with one batch in flight (double buffering).
(This machine reaches the TPU through a ~50 MB/s tunnel; staging input once
matches both the reference's repeat protocol and a production input pipeline
that overlaps uploads with compute.)

Baseline: ≥ 500× real-time per chip (BASELINE.md north star; the
reference's illustrative GPU number is ~2280× forward-only on one 12.48 s
utterance). vs_baseline = value / 500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    from wav2vec2_tpu.utils.device import ensure_backend

    platform = ensure_backend()
    on_tpu = platform == "tpu"

    from wav2vec2_tpu.align.grouping import group_into_words
    from wav2vec2_tpu.align.grouping.path_to_words import FrameEvidence
    from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = Wav2Vec2ModelConfig.from_dict(
        dict(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_dim=[512] * 7,
            conv_kernel=[10, 3, 3, 3, 3, 2, 2],
            conv_stride=[5, 2, 2, 2, 2, 2, 2],
            num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
            pad_token_id=0, vocab_size=32, do_stable_layer_norm=False,
            feat_extract_norm="group", conv_bias=False,
        )
    )
    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    params = init_params(cfg, jax.random.PRNGKey(0))
    aligner = BatchAligner(
        cfg, params, vocab, compute_dtype="bfloat16", normalize_on_device=True
    )

    rng = np.random.default_rng(0)
    # shrink the workload off-TPU so the benchmark still completes (CPU
    # fallback exists for robustness, not for representative numbers)
    batch = 128 if on_tpu else 2
    audio_sec = 10.0
    n = int(audio_sec * 16000)
    s_pad = 256
    words = ["THE", "QUICK", "BROWN", "FOX", "JUMPS", "OVER", "LAZY", "DOG",
             "WHILE", "SINGING", "ANCIENT", "MELODIES", "UNDER", "BRIGHT",
             "WINTER", "STARS", "NEAR", "FROZEN", "RIVERS", "TONIGHT"]
    transcripts = [" ".join(rng.permutation(words)) for _ in range(batch)]
    seqs = [build_token_sequence_case_aware(t, vocab, 0, 4) for t in transcripts]

    audio = (rng.normal(size=(batch, n)) * 4000).clip(-32768, 32767).astype(np.int16)
    tokens = np.zeros((batch, s_pad), np.int32)
    for j, s in enumerate(seqs):
        tokens[j, : len(s.tokens)] = s.tokens
    a_l = np.full(batch, n, np.int32)
    s_l = np.array([len(s.tokens) for s in seqs], np.int32)

    # stage input on device once (the reference's `normalized` input cache)
    dev_audio = jax.device_put(audio)
    dev_a_l = jax.device_put(a_l)
    dev_tokens = jax.device_put(tokens)
    dev_s_l = jax.device_put(s_l)
    jax.block_until_ready((dev_audio, dev_a_l, dev_tokens, dev_s_l))

    def submit():
        """Enqueue one batch; device work + readiness are async."""
        return aligner.submit_padded_batch(dev_audio, dev_a_l, dev_tokens, dev_s_l)

    def drain(handles):
        """Fetch one batch's results and run host grouping. Only the arrays
        grouping needs cross the tunnel (entropy feeds frame_stats, which
        the throughput path doesn't report)."""
        paths, t_lens, emit, margin, blank = jax.device_get(handles[:5])
        out = []
        for j, seq in enumerate(seqs):
            t_i = int(t_lens[j])
            ev = FrameEvidence(
                emit_lp=emit[j, :t_i],
                margin=margin[j, :t_i],
                blank_prob=blank[j, :t_i].astype(np.float64),
            )
            out.append(
                group_into_words(
                    paths[j, :t_i], seq.tokens, seq.chars,
                    seq.normalized_words, ev, 0, 4,
                    cfg.frame_stride_ms(16000),
                )
            )
        return out

    for _ in range(3 if on_tpu else 1):  # warmup: compile + tunnel steady state
        outs = drain(submit())

    # --- correctness gates (outside the timed loop) -----------------------
    # A wedged-but-plausible kernel regression (e.g. a band-mask bug that
    # still yields words) must FAIL the bench, not just len(words) > 0:
    # (a) device DP paths bit-identical vs the numpy oracle on the SAME
    #     graph's log-probs (reference: the bit-identical-backends contract,
    #     viterbi_cuda.rs:197-216);
    # (b) grouped word boundaries vs host-oracle grouping from those
    #     log-probs;
    # (c) the serving dtype: bf16-vs-f32 boundary agreement on the real MXU
    #     (the CPU-bf16 suite in tests/test_bf16_families.py cannot
    #     exercise MXU rounding).
    from wav2vec2_tpu.align.grouping import frame_evidence_from_log_probs
    from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

    n_check = 16 if on_tpu else 2
    handles = aligner.submit_padded_batch(
        dev_audio, dev_a_l, dev_tokens, dev_s_l, return_log_probs=True
    )
    paths_v, t_lens_v, *_rest, lp_v = jax.device_get(handles)
    outs_v = drain(handles)
    total_words = exact = within_one = 0
    stride_ms = cfg.frame_stride_ms(16000)
    for j in range(n_check):
        seq = seqs[j]
        t_i = int(t_lens_v[j])
        s_i = len(seq.tokens)
        lp_j = np.asarray(lp_v[j, :t_i], np.float32)
        oracle = viterbi_numpy(lp_j, np.asarray(seq.tokens, np.int32))
        oracle_states = np.asarray([s for s, _ in oracle], np.int32)
        assert (paths_v[j, :t_i] == oracle_states).all(), (
            f"bench gate (a) FAILED: device DP path differs from the numpy "
            f"oracle at utterance {j} "
            f"(first diff frame {int(np.argmax(paths_v[j, :t_i] != oracle_states))}, "
            f"T={t_i}, S={s_i})"
        )
        ev = frame_evidence_from_log_probs(lp_j, seq.tokens, oracle_states, 0)
        host_words = group_into_words(
            oracle_states, seq.tokens, seq.chars, seq.normalized_words,
            ev, 0, 4, stride_ms,
        )
        dev_words = outs_v[j]
        assert [w.word for w in dev_words] == [w.word for w in host_words], (
            f"bench gate (b) FAILED: word sequences differ at utterance {j}"
        )
        for wd, wh in zip(dev_words, host_words):
            total_words += 1
            d = max(abs(wd.start_ms - wh.start_ms), abs(wd.end_ms - wh.end_ms))
            exact += d == 0
            within_one += d <= stride_ms
    assert within_one == total_words and exact >= 0.99 * total_words, (
        f"bench gate (b) FAILED: device-evidence grouping vs host oracle — "
        f"{exact}/{total_words} exact, {within_one}/{total_words} within "
        f"one frame"
    )

    aligner_f32 = BatchAligner(
        cfg, params, vocab, compute_dtype="float32", normalize_on_device=True
    )
    f32_handles = aligner_f32.submit_padded_batch(
        dev_audio, dev_a_l, dev_tokens, dev_s_l, return_log_probs=True
    )
    lp_f32 = jax.device_get(f32_handles[-1])
    outs_f32 = drain(f32_handles)
    # BOUNDARY agreement is NOT a meaningful dtype gate in this benchmark:
    # random weights on white noise are the no-signal regime, where
    # near-uniform logits make every Viterbi transition a near-tie and
    # bf16-vs-f32 legitimately flips a third of the boundaries (measured on
    # TPU: 1638/2560 within one frame, 882 beyond two — tie flips, not
    # errors). The signal-regime boundary gate (trained model, acoustically
    # pinned boundaries, real MXU) lives in scripts/bf16_gate_tpu.py and
    # runs in tpu-manual.yml. What IS meaningful here, on the flagship
    # geometry: the word sequences must match and the bf16 log-prob field
    # must sit within accumulated-bf16-rounding distance of the f32 graph —
    # a wrong-dtype regression (e.g. norms computed in bf16) shifts it by
    # orders of magnitude.
    lp_mean_d = lp_p99_d = 0.0
    n_frames = 0
    bf16_words = bf16_within_one = 0
    all_d = []
    for j in range(batch):
        got, ref = outs_v[j], outs_f32[j]
        assert [w.word for w in got] == [w.word for w in ref], (
            f"bench gate (c) FAILED: bf16 vs f32 word sequences differ at "
            f"utterance {j}"
        )
        for wg, wr in zip(got, ref):
            d = max(abs(wg.start_ms - wr.start_ms), abs(wg.end_ms - wr.end_ms))
            bf16_words += 1
            bf16_within_one += d <= stride_ms
        t_i = int(t_lens_v[j])
        all_d.append(
            np.abs(
                np.asarray(lp_v[j, :t_i], np.float64)
                - np.asarray(lp_f32[j, :t_i], np.float64)
            ).ravel()
        )
    all_d = np.concatenate(all_d)
    lp_mean_d = float(all_d.mean())
    lp_p99_d = float(np.percentile(all_d, 99))
    n_frames = all_d.size
    # caps = 4x/8x the TPU-measured values (mean 0.0120, p99 0.0384, r4)
    assert lp_mean_d <= 0.05 and lp_p99_d <= 0.3, (
        f"bench gate (c) FAILED: bf16 log-probs diverge from f32 beyond "
        f"bf16 rounding — mean|Δ|={lp_mean_d:.4f} (cap 0.05), "
        f"p99|Δ|={lp_p99_d:.4f} (cap 0.3) over {n_frames} frame·vocab"
    )
    import sys

    print(
        f"bench gates: DP paths bit-identical ({n_check} utts), grouping "
        f"{exact}/{total_words} exact vs host oracle, bf16-vs-f32 "
        f"log-prob mean|Δ|={lp_mean_d:.4f} p99|Δ|={lp_p99_d:.4f}; "
        f"[info, no-signal regime] bf16-vs-f32 boundaries "
        f"{bf16_within_one}/{bf16_words} within one frame",
        file=sys.stderr,
    )
    del aligner_f32, f32_handles, handles, paths_v, t_lens_v, lp_v, lp_f32, \
        outs_v, outs_f32
    # ----------------------------------------------------------------------

    # Steady-state serving throughput: double-buffered submit/drain — the
    # next batch's device work overlaps this batch's readback + host
    # grouping, exactly as the streaming BatchAligner path runs in
    # production (one batch in flight; the tunnel degrades beyond two).
    # The reference's per-utterance median-latency protocol lives in the
    # perf CLI (--output-format perf); this headline is throughput.
    repeats = 10 if on_tpu else 2
    t0 = time.perf_counter()
    inflight = submit()
    for _ in range(repeats - 1):
        nxt = submit()
        outs = drain(inflight)
        inflight = nxt
    outs = drain(inflight)
    total_s = time.perf_counter() - t0

    rtf = repeats * batch * audio_sec / total_s
    assert all(len(w) > 0 for w in outs)

    print(json.dumps({
        "metric": "realtime_factor_e2e_align",
        "value": round(rtf, 1),
        "unit": "x_realtime_audio_sec_per_chip",
        "vs_baseline": round(rtf / 500.0, 3),
    }))


def _watchdog(seconds: float = 1500.0):
    # a WEDGED TPU worker (seen once: a program load that never returns)
    # hangs inside the runtime with no exception — without a deadline the
    # bench would block its caller forever. Normal runs finish in 3-5 min
    # including cold compile; 25 min means genuinely stuck.
    import os
    import sys
    import threading
    import time

    def fire():
        time.sleep(seconds)
        print(f"bench watchdog: no result after {seconds:.0f}s — TPU "
              "worker unresponsive; aborting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()


def _main_with_retry():
    # the TPU tunnel occasionally drops a worker, and a recovering worker
    # pool reports UNAVAILABLE for a while before coming back — keep
    # retrying until the watchdog deadline so the benchmark record is never
    # silently missing when the chip returns mid-window
    _watchdog()
    import sys
    import time

    attempt = 1
    while True:
        try:
            main()
            return
        except Exception as e:
            print(f"bench attempt {attempt} failed "
                  f"({type(e).__name__}: {e}); retrying in 60s",
                  file=sys.stderr)
            attempt += 1
            time.sleep(60)


if __name__ == "__main__":
    _main_with_retry()
