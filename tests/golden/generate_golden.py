"""Golden end-to-end alignment fixture generator.

Freezes (synthetic log-probs -> words + start_ms + end_ms + confidence)
snapshots so the full host alignment path (tokenization -> banded Viterbi
oracle -> evidence -> grouping -> candidate selection -> confidence +
calibration) is locked against regression while forward-pass/perf work
churns numerics elsewhere. Mirrors the golden-vector discipline of the
reference's grouping unit tests (/root/reference/src/alignment/grouping/
tests.rs:179-233) but at the pipeline level.

Everything here is deterministic: seeded PCG64 RNG, float64 log-softmax
cast to float32, host numpy Viterbi oracle, and floats rounded to 8
decimals before serialization. Regenerate with:

    python tests/golden/generate_golden.py

which rewrites alignment_cases.json. A regenerated file should only ever
differ when alignment *behavior* intentionally changes; review such diffs
word by word.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from wav2vec2_tpu.align import tokenization
from wav2vec2_tpu.align.grouping import (
    blank_expansion,
    candidate_selector,
    frame_evidence_from_log_probs,
    group_into_words,
    path_to_words,
)
from wav2vec2_tpu.config import AlignerHyperParams
from wav2vec2_tpu.ops import viterbi_ref

OUT_PATH = Path(__file__).parent / "alignment_cases.json"

STRIDE_MS = 20.0059  # wav2vec2-base frame stride (config.py frame_stride_ms)

VOCAB: dict[str, int] = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
for _i, _c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ'"):
    VOCAB[_c] = 5 + _i
BLANK_ID = 0
SEP_ID = 4
V = 33  # vocab size of the synthetic logit matrices (>= max id + 1)

# (case_id, transcript, T, seed, noise_scale, signal, smear)
# Chosen to cover: short/long, repeated chars, unknown chars/words, casing
# normalization, leading/trailing silence, tight frame budgets, and enough
# noise diversity that every expansion policy wins at least once (asserted
# below at generation time).
CASES = [
    ("short_hello", "HELLO WORLD", 120, 0, 1.0, 6.0, 0.0),
    ("short_cat", "THE CAT", 80, 1, 1.0, 6.0, 0.0),
    ("single_char_word", "A", 24, 2, 1.0, 6.0, 0.0),
    ("single_word_long_audio", "YES", 300, 3, 1.0, 5.0, 0.0),
    ("repeated_chars", "BOOKKEEPER SWEET", 200, 4, 1.0, 6.0, 0.0),
    ("double_letters", "LLAMA LLAMA SS", 180, 5, 1.2, 5.0, 0.0),
    ("unknown_chars_dropped", "CAFÉ NAÏVE TEST", 160, 6, 1.0, 6.0, 0.0),
    ("unknown_word_skipped", "123 HELLO 456 WORLD", 140, 7, 1.0, 6.0, 0.0),
    ("lowercase_input", "good day to you", 220, 8, 1.0, 6.0, 0.0),
    ("apostrophe", "DON'T STOP", 130, 9, 1.0, 6.0, 0.0),
    ("long_sentence",
     "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG WHILE EVERYONE ELSE "
     "WATCHES FROM A COMFORTABLE DISTANCE IN THE WARM AFTERNOON SUN",
     1400, 10, 1.0, 6.0, 0.0),
    ("tight_frames", "HI THERE", 40, 11, 0.8, 6.0, 0.0),
    ("very_tight_frames", "AB", 10, 12, 0.5, 7.0, 0.0),
    ("noisy", "SOME NOISY SPEECH HERE", 260, 13, 2.5, 3.5, 0.5),
    ("very_noisy", "BARELY AUDIBLE WORDS", 240, 14, 3.0, 2.5, 1.0),
    ("long_silence_edges", "QUIET START AND END", 400, 15, 1.0, 6.0, 0.0),
    ("mid_pauses", "LONG PAUSE BETWEEN WORDS", 350, 16, 1.0, 6.0, 0.0),
    ("smeared_boundaries", "FUZZY EDGES EVERYWHERE", 280, 17, 1.5, 4.0, 1.5),
    ("ten_seconds", "THIS UTTERANCE RUNS ABOUT TEN SECONDS OF AUDIO "
     "AT FIFTY FRAMES PER SECOND", 499, 18, 1.2, 5.0, 0.3),
    ("alphabet_soup", "XYLOPHONE QUARTZ JIGSAW VEXED", 320, 19, 1.3, 5.0, 0.8),
    # 3-frame inter-word gaps with HIGH blank probability: balanced
    # (min_interior_silence 4) and conservative_start (6) can't absorb any
    # of them, but aggressive_tail (2) absorbs one high-confidence blank
    # frame per gap and collects the boundary-confidence reward.
    ("tiny_confident_gaps", "HUSHED GAPS HERE", 200, 20, 1.0, 6.0, 0.0),
    ("tiny_confident_gaps_2", "MORE SHORT PAUSES NOW", 260, 21, 1.0, 6.0, 0.0),
]

# per-case extras keyed by id: gap_frames pins each (blank, sep, blank)
# inter-word cluster to that many frames; gap_boost replaces `signal` on
# those frames
CASE_EXTRAS = {
    "long_silence_edges": {"silence_edges": True},
    "mid_pauses": {"silence_edges": True},
    "tiny_confident_gaps": {"gap_frames": 3, "gap_boost": 6.0},
    "tiny_confident_gaps_2": {"gap_frames": 3, "gap_boost": 6.0},
}


def synth_log_probs(tokens: list[int], t_len: int, seed: int,
                    noise: float, signal: float, smear: float,
                    silence_edges: bool = False,
                    gap_frames: int = 0, gap_boost: float = 0.0) -> np.ndarray:
    """Plan a monotone state path over t_len frames and emit logits that
    favor it, then log-softmax (f64) -> f32. Deterministic for a given
    (tokens, t_len, seed, knobs)."""
    rng = np.random.default_rng(seed)
    s_len = len(tokens)
    # frame budget per state: at least 1, random extras
    extra = t_len - s_len
    if extra < 0:
        raise ValueError(f"t_len {t_len} < s_len {s_len}")
    tok = np.asarray(tokens)
    # inter-word clusters: (blank, sep, blank) around each separator state
    in_gap_cluster = np.zeros(s_len, dtype=bool)
    for s in np.flatnonzero(tok == SEP_ID):
        in_gap_cluster[max(s - 1, 0):min(s + 2, s_len)] = True

    weights = rng.random(s_len)
    if silence_edges:
        # pile extra frames onto the leading/trailing blank states
        weights[0] += s_len * 0.5
        weights[-1] += s_len * 0.5

    alloc = np.ones(s_len, dtype=np.int64)
    if gap_frames > 0:
        # pin each gap cluster to ~gap_frames total, split across its states
        for s in np.flatnonzero(tok == SEP_ID):
            members = [i for i in range(max(s - 1, 0), min(s + 2, s_len))]
            per = gap_frames // len(members)
            for i in members:
                alloc[i] = per
            alloc[s] += gap_frames - per * len(members)
        extra = t_len - int(alloc.sum())
        if extra < 0:
            raise ValueError("t_len too small for requested gap_frames")
        weights = np.where(in_gap_cluster, 0.0, weights)
    if extra > 0 and weights.sum() > 0:
        shares = np.floor(weights / weights.sum() * extra).astype(np.int64)
        alloc += shares
        # distribute the rounding remainder to the largest weights
        rem = extra - int(shares.sum())
        for idx in np.argsort(-weights)[:rem]:
            alloc[idx] += 1
    state_at_frame = np.repeat(np.arange(s_len), alloc)
    assert state_at_frame.shape[0] == t_len

    logits = rng.normal(0.0, noise, size=(t_len, V)).astype(np.float64)
    active = tok[state_at_frame]
    boost = np.full(t_len, signal)
    if gap_frames > 0:
        boost = np.where(in_gap_cluster[state_at_frame], gap_boost, boost)
    logits[np.arange(t_len), active] += boost
    if smear > 0:
        # leak signal onto the neighbor state's token to blur boundaries
        nxt = tok[np.minimum(state_at_frame + 1, s_len - 1)]
        logits[np.arange(t_len), nxt] += smear
    lse = np.log(np.exp(logits - logits.max(axis=1, keepdims=True)).sum(axis=1))
    lp = logits - logits.max(axis=1, keepdims=True) - lse[:, None]
    return lp.astype(np.float32)


def _round(x, nd=8):
    return None if x is None else round(float(x), nd)


def run_case(case_id: str, transcript: str, t_len: int, seed: int,
             noise: float, signal: float, smear: float) -> dict:
    hp = AlignerHyperParams()
    seq = tokenization.build_token_sequence_case_aware(
        transcript, VOCAB, BLANK_ID, SEP_ID
    )
    lp = synth_log_probs(
        seq.tokens, t_len, seed, noise, signal, smear,
        **CASE_EXTRAS.get(case_id, {}),
    )
    path = viterbi_ref.viterbi_numpy(lp, np.asarray(seq.tokens))
    states = [s for s, _ in path]
    evidence = frame_evidence_from_log_probs(lp, seq.tokens, states, BLANK_ID)
    words = group_into_words(
        path, seq.tokens, seq.chars, seq.normalized_words, evidence,
        BLANK_ID, SEP_ID, STRIDE_MS, hp,
    )

    # metadata: which expansion policy won (selection re-run; not an output)
    raw = path_to_words.collect(
        path, seq.tokens, seq.chars, seq.normalized_words, evidence,
        BLANK_ID, SEP_ID,
    )
    policy_name = None
    if raw:
        candidates = [
            (pc, blank_expansion.expand_with_policy(
                raw, path[0][1], path[-1][1], pc))
            for pc in hp.expansion_policies
        ]
        chosen = candidate_selector.select_best(raw, candidates, evidence, hp)
        policy_name = chosen.policy.name if chosen else hp.expansion_policies[0].name

    return {
        "id": case_id,
        "transcript": transcript,
        "t_len": t_len,
        "seed": seed,
        "noise": noise,
        "signal": signal,
        "smear": smear,
        "winning_policy": policy_name,
        "words": [
            {
                "word": w.word,
                "start_ms": w.start_ms,
                "end_ms": w.end_ms,
                "confidence": _round(w.confidence),
                "stats": {
                    "mean_logp": _round(w.confidence_stats.mean_logp),
                    "geo_mean_prob": _round(w.confidence_stats.geo_mean_prob),
                    "quality_confidence": _round(
                        w.confidence_stats.quality_confidence),
                    "calibrated_confidence": _round(
                        w.confidence_stats.calibrated_confidence),
                    "min_logp": _round(w.confidence_stats.min_logp),
                    "p10_logp": _round(w.confidence_stats.p10_logp),
                    "mean_margin": _round(w.confidence_stats.mean_margin),
                    "coverage_frame_count":
                        w.confidence_stats.coverage_frame_count,
                    "boundary_confidence": _round(
                        w.confidence_stats.boundary_confidence),
                },
            }
            for w in words
        ],
    }


PHONEME_OUT_PATH = Path(__file__).parent / "phoneme_cases.json"

# IPA-style phoneme vocab: multi-codepoint symbols exercise the verbatim
# lookup the word path's single-char rule would destroy
PHONEME_VOCAB: dict[str, int] = {
    "<pad>": 0, "|": 4, "a": 5, "b": 6, "k": 7, "u": 8, "ɛ̃": 9, "tʃ": 10,
    "ʃ": 11, "ɔ̃": 12, "t t": 13, "ə": 14,
}

# (case_id, transcript, T, seed, noise, signal, smear)
PHONEME_CASES = [
    ("phones_basic", "a tʃ ɛ̃ b", 90, 30, 1.0, 6.0, 0.0),
    ("phones_word_seps", "k u | a tʃ | ɛ̃ ə", 160, 31, 1.0, 6.0, 0.0),
    ("phones_repeated", "a a tʃ tʃ ʃ", 140, 32, 1.2, 5.0, 0.0),
    ("phones_unknown_dropped", "a xx tʃ yy ɔ̃", 110, 33, 1.0, 6.0, 0.0),
    ("phones_noisy", "ɛ̃ ɔ̃ ʃ tʃ ə a", 220, 34, 2.5, 3.5, 0.5),
    ("phones_tight", "a b", 8, 35, 0.8, 6.0, 0.0),
]


def run_phoneme_case(case_id: str, transcript: str, t_len: int, seed: int,
                     noise: float, signal: float, smear: float) -> dict:
    from wav2vec2_tpu.align.grouping.phoneme import group_into_phonemes

    seq = tokenization.build_token_sequence_phoneme(
        transcript, PHONEME_VOCAB, BLANK_ID, SEP_ID
    )
    lp = synth_log_probs(seq.tokens, t_len, seed, noise, signal, smear)
    path = viterbi_ref.viterbi_numpy(lp, np.asarray(seq.tokens))
    states = [s for s, _ in path]
    evidence = frame_evidence_from_log_probs(lp, seq.tokens, states, BLANK_ID)
    units = group_into_phonemes(
        np.asarray(states), seq, evidence, BLANK_ID, SEP_ID, STRIDE_MS
    )
    return {
        "id": case_id,
        "transcript": transcript,
        "t_len": t_len,
        "seed": seed,
        "noise": noise,
        "signal": signal,
        "smear": smear,
        "units": [
            {
                "word": u.word,
                "start_ms": u.start_ms,
                "end_ms": u.end_ms,
                "confidence": _round(u.confidence),
            }
            for u in units
        ],
    }


def build_phoneme_corpus() -> dict:
    return {
        "format": 1,
        "stride_ms": STRIDE_MS,
        "vocab": PHONEME_VOCAB,
        "cases": [run_phoneme_case(*c) for c in PHONEME_CASES],
    }


def build_corpus() -> dict:
    cases = [run_case(*c) for c in CASES]
    policies = {c["winning_policy"] for c in cases if c["winning_policy"]}
    return {
        "format": 1,
        "stride_ms": STRIDE_MS,
        "vocab": VOCAB,
        "policies_covered": sorted(policies),
        "cases": cases,
    }


def main() -> None:
    corpus = build_corpus()
    hp = AlignerHyperParams()
    all_policies = {pc.name for pc in hp.expansion_policies}
    covered = set(corpus["policies_covered"])
    if covered != all_policies:
        raise SystemExit(
            f"policy coverage incomplete: won={covered}, "
            f"expected={all_policies} — adjust CASES seeds/noise"
        )
    OUT_PATH.write_text(json.dumps(corpus, indent=1, sort_keys=True) + "\n")
    n_words = sum(len(c["words"]) for c in corpus["cases"])
    print(f"wrote {OUT_PATH} ({len(corpus['cases'])} cases, {n_words} words, "
          f"policies: {sorted(covered)})")

    ph = build_phoneme_corpus()
    PHONEME_OUT_PATH.write_text(json.dumps(ph, indent=1, sort_keys=True) + "\n")
    n_units = sum(len(c["units"]) for c in ph["cases"])
    print(f"wrote {PHONEME_OUT_PATH} ({len(ph['cases'])} cases, "
          f"{n_units} units)")


if __name__ == "__main__":
    main()
