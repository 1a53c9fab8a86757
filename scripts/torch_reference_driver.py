#!/usr/bin/env python3
"""Second-implementation benchmark driver: torch CPU + HF transformers.

Role: the analog of the reference's Python-reference benchmark driver
(/root/reference/scripts/wav2vec2aligner_librispeech_textgrids.py:1-621)
plus its instrumentation patch
(/root/reference/wav2vec2aligner-main.perf-monitoring.patch:1-649) — an
INDEPENDENT forced-alignment implementation that walks a LibriSpeech-layout
dataset and emits the same artifacts as the main framework:

- baseline `stem.TextGrid` files (words / words-confidence / transcript
  tiers), so `python -m wav2vec2_tpu.cli.compare_textgrids ROOT --suffix
  _tpu` performs the turnkey cross-implementation quality comparison the
  reference ran between its Rust and Python aligners;
- schema-v1 perf JSONL records with per-stage (forward/post/dp/group/conf)
  timings and the warmup/repeats/median protocol, so
  `scripts/compare_perf_jsonl.py` compares the two implementations' perf.

Division of shared vs independent code mirrors the reference (which shared
the perf schema + dataset layout between Rust and Python on purpose,
BENCHMARKS.md:285-304): dataset discovery, FLAC decode, TextGrid
serialization, and the perf JSONL formatter are imported from wav2vec2_tpu;
every piece of *alignment math* below — normalization, tokenization, the
CTC trellis DP, word grouping, blank expansion, confidence — is a fresh
torch/python implementation of the published algorithm
(/root/reference/src/alignment/{viterbi.rs:50-156,tokenization.rs:63-116,
grouping/*}), structurally unlike the JAX/numpy code in wav2vec2_tpu.

Usage:
    python scripts/torch_reference_driver.py --model-dir M --dataset-root D \
        [--output-format {textgrid,perf}] [--perf-out P.jsonl]
        [--perf-warmup N] [--perf-repeats N] [--limit N] [--offset N]
        [--textgrid-suffix S] [--no-overwrite] [--progress-every N]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from statistics import median

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from wav2vec2_tpu.cli.perf_report_formatter import (  # noqa: E402
    PerfJsonlAppender,
    PerfRunConfig,
    PerfUtteranceRecord,
    write_json_report,
    write_summary_report,
)
from wav2vec2_tpu.data.audio import read_audio_mono  # noqa: E402
from wav2vec2_tpu.data.librispeech import (  # noqa: E402
    load_cases_from_transcripts,
    resolve_dataset_base_and_subsets,
)
from wav2vec2_tpu.data.textgrid import write_textgrid  # noqa: E402
from wav2vec2_tpu.types import WordTiming  # noqa: E402


# --------------------------------------------------------------------------
# Independent alignment implementation (torch)
# --------------------------------------------------------------------------


@dataclass
class _Word:
    """Word under construction while walking the trellis path."""

    text: str
    start_frame: int
    end_frame: int
    emission_logps: list[float] = field(default_factory=list)


class TorchForcedAligner:
    """CTC forced aligner on torch CPU via transformers' `*ForCTC` models
    (any CTC family the main framework supports: wav2vec2, HuBERT,
    data2vec-audio, WavLM, SEW/SEW-D, Wav2Vec2-Conformer, UniSpeech/-SAT,
    MMS-adapter and add_adapter checkpoints, Wav2Vec2-BERT).

    Implements the same published algorithm as the main framework but with
    none of its alignment code: vectorized torch trellis with tie rules
    stay > s-1 > s-2 (strict `>` as in viterbi.rs:136-156), final state
    argmax over the last two states (viterbi.rs:90-93), tight word
    boundaries + balanced blank expansion (12/6/4 budgets,
    blank_expansion.rs:8-11), geometric-mean-probability confidence.
    """

    BLANK_EXPANSION = (12, 6, 4)  # (min_interior, max_left, max_right)

    def __init__(self, model_dir: str | Path, device: str = "cpu",
                 units: str = "word"):
        import torch
        import transformers

        self.torch = torch
        model_dir = Path(model_dir)
        cfg_dict = json.loads((model_dir / "config.json").read_text())
        model_type = cfg_dict.pop("model_type", "wav2vec2")
        self.config = transformers.AutoConfig.for_model(model_type, **cfg_dict)
        weights = model_dir / "model.safetensors"
        if weights.exists():
            self.model = transformers.AutoModelForCTC.from_config(
                self.config
            ).eval()
            from safetensors.torch import load_file

            state = load_file(str(weights))
            self.model.load_state_dict(state, strict=False)
        else:  # torch-format checkpoint directory
            self.model = transformers.AutoModelForCTC.from_pretrained(
                model_dir
            ).eval()
        self.device = torch.device(device)
        self.model.to(self.device)

        # Wav2Vec2-BERT consumes log-mel features, not raw waveform; use
        # HF's own extractor so the whole acoustic path stays independent
        # of the main framework's mel implementation (models/mel.py).
        self.mel_extractor = None
        if model_type == "wav2vec2-bert":
            self.mel_extractor = transformers.SeamlessM4TFeatureExtractor()
            stride = 160 * 2  # 10 ms kaldi-fbank hop, stacked x2
        else:
            stride = 1
            for s in self.config.conv_stride:
                stride *= int(s)
        if getattr(self.config, "add_adapter", False):
            stride *= int(self.config.adapter_stride) ** int(
                self.config.num_adapter_layers
            )

        vocab = json.loads((model_dir / "vocab.json").read_text())
        self.units = units
        if units == "phoneme":
            # phoneme vocabs keep multi-codepoint symbols verbatim
            self.vocab = {k: int(v) for k, v in vocab.items()}
        else:
            self.vocab = {k: int(v) for k, v in vocab.items() if len(k) == 1}
        self.blank_id = int(self.config.pad_token_id)
        self.sep_id = self.vocab.get("|", 0)
        self.frame_stride_ms = stride / 16_000.0 * 1000.0
        self.dtype_label = "float32"
        self.device_label = f"torch-{device}"

    # -- stage 0: normalization (runtime.rs:501-517 semantics) ------------

    @staticmethod
    def normalize(samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples, dtype=np.float64)
        if x.size == 0:
            return x.astype(np.float32)
        mu = x.mean()
        sigma = x.std()
        if sigma < 1e-7:
            sigma = 1e-7
        return ((x - mu) / sigma).astype(np.float32)

    # -- stage 1: transcript → blank-interleaved token sequence -----------

    def tokenize(self, transcript: str):
        """Fresh implementation of the tokenization contract
        (tokenization.rs:63-116): vocab-casing normalization, unknown-char
        drop, blank-interleaved tokens with `|` separators, parallel chars
        array (None for blanks)."""
        letters = [k for k in self.vocab if k.isalpha()]
        if letters and all(k.isupper() for k in letters):
            transcript = transcript.upper()
        elif letters and all(k.islower() for k in letters):
            transcript = transcript.lower()

        words: list[str] = []
        for raw in transcript.split():
            kept = "".join(c for c in raw if c in self.vocab)
            if kept:
                words.append(kept)

        tokens: list[int] = [self.blank_id]
        chars: list[str | None] = [None]
        for wi, word in enumerate(words):
            if wi > 0:
                tokens += [self.sep_id, self.blank_id]
                chars += ["|", None]
            for c in word:
                tokens += [self.vocab[c], self.blank_id]
                chars += [c, None]
        return tokens, chars, words

    def tokenize_phoneme(self, transcript: str):
        """Phoneme-CTC contract: whitespace-separated symbols looked up
        VERBATIM (multi-codepoint allowed), unknown symbols dropped, "|" /
        word_sep_id emits one separator state (deduped), blanks
        interleaved. Fresh implementation of
        align/tokenization.build_token_sequence_phoneme's published
        behavior."""
        tokens: list[int] = [self.blank_id]
        chars: list[str | None] = [None]
        emitted = False
        for sym in transcript.split():
            tid = self.vocab.get(sym)
            if tid is None:
                continue
            if sym == "|" or tid == self.sep_id:
                if emitted and tokens[-2] != self.sep_id:
                    tokens += [self.sep_id, self.blank_id]
                    chars += ["|", None]
                continue
            tokens += [tid, self.blank_id]
            chars += [sym, None]
            emitted = True
        return tokens, chars

    def group_phonemes(
        self,
        path: list[tuple[int, int]],
        log_probs_np: np.ndarray,
        tokens: list[int],
        chars: list[str | None],
    ) -> list[WordTiming]:
        """Unit-level grouping: each maximal per-STATE run of non-blank,
        non-separator frames is one tight unit [first, last+1)·stride — no
        blank expansion; confidence is the geometric mean of the emission
        posteriors over ALL frames of the run."""
        units: list[WordTiming] = []
        stride = self.frame_stride_ms
        run_state, run_start, run_sum = -1, 0, 0.0

        def flush(end_frame: int):
            if run_state < 0:
                return
            tok = tokens[run_state]
            if tok in (self.blank_id, self.sep_id):
                return
            n = end_frame - run_start
            start_ms = int(round(run_start * stride))
            end_ms = max(int(round(end_frame * stride)), start_ms + 1)
            units.append(WordTiming(
                word=chars[run_state], start_ms=start_ms, end_ms=end_ms,
                confidence=math.exp(run_sum / n) if n else None,
            ))

        for s, t in path:
            if s != run_state:
                flush(t)
                run_state, run_start, run_sum = s, t, 0.0
            run_sum += float(log_probs_np[t, tokens[s]])
        flush(len(path))
        return units

    # -- stage 2: acoustic model forward -----------------------------------

    def forward(self, normalized: np.ndarray):
        torch = self.torch
        with torch.no_grad():
            if self.mel_extractor is not None:
                feats = self.mel_extractor(
                    [np.asarray(normalized)], sampling_rate=16_000,
                    return_tensors="pt",
                )
                mask = feats["attention_mask"].to(self.device)
                logits = self.model(
                    feats["input_features"].to(self.device),
                    attention_mask=mask,
                ).logits.squeeze(0)
                # HF pads odd mel-frame counts to an even stacked length;
                # drop the padded tail frame(s) the mask excludes (the main
                # framework's mel frontend floors t_mel//2, models/mel.py)
                n_real = int(mask.sum().item())
                t_out = n_real
                if getattr(self.config, "add_adapter", False):
                    # HF adapter conv arithmetic: kernel k, stride st,
                    # padding st//2 -> floor((t + 2*(st//2) - k)/st) + 1
                    st = int(self.config.adapter_stride)
                    k = int(self.config.adapter_kernel_size)
                    for _ in range(int(self.config.num_adapter_layers)):
                        t_out = (t_out + 2 * (st // 2) - k) // st + 1
                logits = logits[:t_out]
            else:
                x = torch.from_numpy(np.ascontiguousarray(normalized)).to(
                    self.device
                )
                logits = self.model(x.unsqueeze(0)).logits.squeeze(0)
        return logits  # [T, V] torch float32, pre-log-softmax

    def log_softmax(self, logits):
        return self.torch.nn.functional.log_softmax(logits, dim=-1)

    # -- stage 3: banded CTC trellis (vectorized over states) --------------

    def trellis_align(self, log_probs, tokens: list[int]) -> list[tuple[int, int]]:
        """Vectorized-over-states trellis: per time step the stay / s-1 /
        s-2 candidates are built as shifted score rows and reduced with a
        first-max argmax, which realizes the strict-`>` tie preference
        stay > s-1 > s-2 of viterbi.rs:136-156. The reachability band
        (viterbi.rs:71-77) is applied as a -inf mask."""
        torch = self.torch
        t_len = int(log_probs.shape[0])
        s_len = len(tokens)
        if t_len == 0 or s_len == 0:
            return []

        tok = torch.tensor(tokens, dtype=torch.long, device=log_probs.device)
        emit = log_probs[:, tok]  # [T, S]
        neg_inf = float("-inf")

        # repeated-token rule: the s-2 skip is illegal when tokens match
        skip_ok = torch.zeros(s_len, dtype=torch.bool, device=emit.device)
        if s_len > 2:
            skip_ok[2:] = tok[2:] != tok[:-2]

        scores = torch.full((s_len,), neg_inf, device=emit.device)
        scores[0] = emit[0, 0]
        if s_len > 1:
            scores[1] = emit[0, 1]

        state_idx = torch.arange(s_len, device=emit.device)
        bp = torch.zeros((t_len, s_len), dtype=torch.int8, device=emit.device)
        floor_state = max(s_len - 2, 0)

        for t in range(1, t_len):
            remaining = t_len - 1 - t
            lo = max(floor_state - 2 * remaining, 0)
            hi = min(2 * t + 1, s_len - 1)

            stay = scores
            from_prev = torch.cat(
                [scores.new_full((1,), neg_inf), scores[:-1]]
            )
            from_skip = torch.cat(
                [scores.new_full((2,), neg_inf), scores[:-2]]
            ) if s_len > 1 else scores.new_full((s_len,), neg_inf)
            from_skip = torch.where(
                skip_ok, from_skip, from_skip.new_full((s_len,), neg_inf)
            )

            cands = torch.stack([stay, from_prev, from_skip])  # [3, S]
            best, step = cands.max(dim=0)  # first max → stay>s-1>s-2 on tie
            in_band = (state_idx >= lo) & (state_idx <= hi)
            scores = torch.where(
                in_band, best + emit[t], best.new_full((s_len,), neg_inf)
            )
            bp[t] = torch.where(in_band, step.to(torch.int8), bp[t])

        s = s_len - 1
        if s_len >= 2 and float(scores[s_len - 2]) > float(scores[s_len - 1]):
            s = s_len - 2

        bp_host = bp.cpu().numpy()
        path = [(s, t_len - 1)]
        for t in range(t_len - 1, 0, -1):
            s -= int(bp_host[t, s])
            path.append((s, t - 1))
        path.reverse()
        return path

    # -- stage 4: path → words, blank expansion, confidence ----------------

    def group_words(
        self,
        path: list[tuple[int, int]],
        log_probs_np: np.ndarray,
        tokens: list[int],
        chars: list[str | None],
    ) -> list[_Word]:
        """Tight word boundaries from the trellis path: blank frames are
        skipped, separator frames flush the current word, char frames
        extend it; emission log-probs accumulate only on new-state entry
        (path_to_words.rs:87-102 semantics, fresh code)."""
        words: list[_Word] = []
        current: _Word | None = None
        prev_state = -1
        for state, frame in path:
            ch = chars[state]
            is_new = state != prev_state
            prev_state = state
            if ch is None:
                continue
            if ch == "|":
                if current is not None:
                    words.append(current)
                    current = None
                continue
            if current is None:
                current = _Word(ch, frame, frame)
            else:
                if is_new:
                    current.text += ch
                current.end_frame = frame
            if is_new:
                current.emission_logps.append(
                    float(log_probs_np[frame, tokens[state]])
                )
        if current is not None:
            words.append(current)
        return words

    def expand_balanced(
        self, words: list[_Word], total_frames: int
    ) -> list[_Word]:
        """Balanced blank-expansion policy (blank_expansion.rs:89-118
        arithmetic with the 12/6/4 budgets). Leading/trailing silence is
        never attributed to words."""
        min_interior, max_left, max_right = self.BLANK_EXPANSION
        for i in range(len(words) - 1):
            gap = words[i + 1].start_frame - words[i].end_frame - 1
            if gap <= 0:
                continue
            silence = min(min_interior, gap)
            absorb = gap - silence
            left = min(absorb, max_left)
            right = min(absorb - left, max_right)
            words[i].end_frame += left
            words[i + 1].start_frame -= right
        return words

    @staticmethod
    def confidence(word: _Word) -> float:
        if not word.emission_logps:
            return 0.0
        mean_logp = sum(word.emission_logps) / len(word.emission_logps)
        return min(max(math.exp(mean_logp), 0.0), 1.0)

    # -- full pipeline ------------------------------------------------------

    def align(self, samples: np.ndarray, transcript: str) -> list[WordTiming]:
        out, _ = self.align_profiled(samples, transcript)
        return out

    def align_profiled(self, samples: np.ndarray, transcript: str):
        """Returns (word timings, per-stage timing dict in ms) — the
        instrumentation the reference's perf-monitoring patch added to its
        Python aligner (align_speech_file_profiled)."""
        timings: dict[str, float] = {}
        t_total = time.perf_counter()

        normalized = self.normalize(samples)

        t0 = time.perf_counter()
        logits = self.forward(normalized)
        timings["forward_ms"] = (time.perf_counter() - t0) * 1000.0

        t0 = time.perf_counter()
        log_probs = self.log_softmax(logits)
        log_probs_np = log_probs.cpu().numpy()
        timings["post_ms"] = (time.perf_counter() - t0) * 1000.0

        if self.units == "phoneme":
            tokens, chars = self.tokenize_phoneme(transcript)
        else:
            tokens, chars, _ = self.tokenize(transcript)
        t_len = int(log_probs.shape[0])
        if not tokens or t_len < (len(tokens) + 1) // 2:
            raise ValueError(
                f"transcript too long for audio: T={t_len} S={len(tokens)}"
            )

        t0 = time.perf_counter()
        path = self.trellis_align(log_probs, tokens)
        timings["dp_ms"] = (time.perf_counter() - t0) * 1000.0

        if self.units == "phoneme":
            t0 = time.perf_counter()
            out = self.group_phonemes(path, log_probs_np, tokens, chars)
            timings["group_ms"] = (time.perf_counter() - t0) * 1000.0
            timings["conf_ms"] = 0.0
        else:
            t0 = time.perf_counter()
            words = self.group_words(path, log_probs_np, tokens, chars)
            words = self.expand_balanced(words, t_len)
            timings["group_ms"] = (time.perf_counter() - t0) * 1000.0

            t0 = time.perf_counter()
            stride = self.frame_stride_ms
            out = [
                WordTiming(
                    word=w.text,
                    start_ms=int(round(w.start_frame * stride)),
                    end_ms=int(round((w.end_frame + 1) * stride)),
                    confidence=self.confidence(w),
                )
                for w in words
            ]
            timings["conf_ms"] = (time.perf_counter() - t0) * 1000.0

        timings["align_ms"] = (
            timings["dp_ms"] + timings["group_ms"] + timings["conf_ms"]
        )
        timings["total_ms"] = (time.perf_counter() - t_total) * 1000.0
        timings["t_len"] = t_len
        timings["s_len"] = len(tokens)
        return out, timings


# --------------------------------------------------------------------------
# Driver (dataset walk, TextGrid / perf output)
# --------------------------------------------------------------------------


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model-dir", required=True)
    p.add_argument("--dataset-root", required=True)
    p.add_argument("--device", default="cpu", choices=["cpu"])
    p.add_argument("--units", default="word", choices=["word", "phoneme"],
                   help="phoneme: whitespace-separated vocab symbols in, "
                        "one tight timing unit per phone out (the CLI's "
                        "--units phoneme analog, fresh implementation)")
    p.add_argument(
        "--output-format", default="textgrid", choices=["textgrid", "perf"]
    )
    p.add_argument("--textgrid-suffix", default="",
                   help="suffix before .TextGrid (default: none = baseline)")
    p.add_argument("--no-overwrite", action="store_true")
    p.add_argument("--perf-out", default=None)
    p.add_argument("--perf-warmup", type=int, default=10)
    p.add_argument("--perf-repeats", type=int, default=30)
    p.add_argument("--perf-append", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--progress-every", type=int, default=100)
    return p.parse_args(argv)


def run(argv=None) -> int:
    args = parse_args(argv)
    base, subset_dirs = resolve_dataset_base_and_subsets(args.dataset_root)
    subset_dirs = [p for p in subset_dirs if p.exists()]
    cases = load_cases_from_transcripts(base, subset_dirs)
    cases = cases[args.offset:]
    if args.limit:
        cases = cases[: args.limit]
    if not cases:
        print("error: no cases found", file=sys.stderr)
        return 1

    aligner = TorchForcedAligner(args.model_dir, device=args.device,
                                 units=args.units)
    print(
        f"[torch_reference_driver] {len(cases)} cases, device={args.device}, "
        f"stride={aligner.frame_stride_ms:.1f} ms",
        file=sys.stderr,
    )

    perf_records: list[PerfUtteranceRecord] = []
    appender = None
    if args.output_format == "perf":
        if not args.perf_out:
            print("error: perf mode requires --perf-out", file=sys.stderr)
            return 1
        if args.perf_append:
            appender = PerfJsonlAppender(args.perf_out)

    written = 0
    for i, case in enumerate(cases):
        audio_abs = base / case.audio_path
        samples, sr = read_audio_mono(audio_abs)
        duration_ms = int(round(len(samples) / sr * 1000.0))

        if args.output_format == "textgrid":
            out_path = audio_abs.with_name(
                f"{audio_abs.stem}{args.textgrid_suffix}.TextGrid"
            )
            if args.no_overwrite and out_path.exists():
                continue
            words = aligner.align(samples, case.transcript)
            write_textgrid(
                audio_abs, case.transcript, words, duration_ms,
                suffix=args.textgrid_suffix,
            )
            written += 1
        else:
            normalized = aligner.normalize(samples)
            warmup = args.perf_warmup if i == 0 else 0
            for _ in range(warmup):
                aligner.align_profiled(normalized, case.transcript)
            stage_reps: dict[str, list[float]] = {}
            t_len = s_len = 0
            for _ in range(max(args.perf_repeats, 1)):
                _, tm = aligner.align_profiled(normalized, case.transcript)
                t_len, s_len = int(tm["t_len"]), int(tm["s_len"])
                for k in ("forward_ms", "post_ms", "dp_ms", "group_ms",
                          "conf_ms", "align_ms", "total_ms"):
                    stage_reps.setdefault(k, []).append(float(tm[k]))
            med = {k: median(v) for k, v in stage_reps.items()}
            ts = t_len * s_len
            rec = PerfUtteranceRecord(
                utterance_id=case.id,
                audio_path=str(audio_abs),
                duration_ms=duration_ms,
                num_frames_t=t_len,
                state_len=s_len,
                ts_product=ts,
                vocab_size=int(aligner.config.vocab_size),
                dtype=aligner.dtype_label,
                device=aligner.device_label,
                frame_stride_ms=aligner.frame_stride_ms,
                warmup=args.perf_warmup,
                repeats=args.perf_repeats,
                aggregate="median",
                forward_ms=med["forward_ms"],
                post_ms=med["post_ms"],
                dp_ms=med["dp_ms"],
                group_ms=med["group_ms"],
                conf_ms=med["conf_ms"],
                align_ms=med["align_ms"],
                align_ms_per_ts=med["align_ms"] / ts if ts else 0.0,
                align_ms_per_t=med["align_ms"] / t_len if t_len else 0.0,
                total_ms=med["total_ms"],
                forward_ms_repeats=stage_reps["forward_ms"],
                post_ms_repeats=stage_reps["post_ms"],
                dp_ms_repeats=stage_reps["dp_ms"],
                group_ms_repeats=stage_reps["group_ms"],
                conf_ms_repeats=stage_reps["conf_ms"],
                align_ms_repeats=stage_reps["align_ms"],
                total_ms_repeats=stage_reps["total_ms"],
            )
            perf_records.append(rec)
            if appender is not None:
                appender.append(rec)
            written += 1

        if args.progress_every and (i + 1) % args.progress_every == 0:
            print(f"  {i + 1}/{len(cases)}", file=sys.stderr)

    if args.output_format == "perf":
        from wav2vec2_tpu.cli.perf_report_formatter import (
            aggregate_stats,
            summary_path_for,
        )

        cfg = PerfRunConfig(
            warmup=args.perf_warmup, repeats=args.perf_repeats,
            aggregate="median", append=args.perf_append,
        )
        aggregate = aggregate_stats(perf_records)
        if appender is not None:
            appender.finish()
        else:
            write_json_report(args.perf_out, cfg, perf_records, aggregate)
        write_summary_report(summary_path_for(args.perf_out), cfg, aggregate)

    print(f"[torch_reference_driver] wrote {written} outputs", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(run())
