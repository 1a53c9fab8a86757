"""Long-form alignment: chunked encoder with overlap-stitched log-probs.

The reference encodes each utterance in ONE forward regardless of length —
O(T²) attention makes hour-scale audio infeasible (SURVEY.md §5
"long-context: absent", §2.8 SP row). The TPU design chunks the waveform
into overlapping windows, runs the encoder over the chunk BATCH (one padded
forward), stitches the per-frame log-probs at overlap midpoints (each frame
taken from the chunk where it is deepest, i.e. farthest from a chunk edge,
so boundary frames always have full acoustic context), and then runs a
single banded Viterbi over the stitched [T_total, V] matrix — the DP is
O(T·S)-banded and has no quadratic term, so only the encoder needed
chunking.

Chunk boundaries are frame-aligned (multiples of the conv stride product,
320 samples = 20 ms for wav2vec2) so stitched chunk frames land exactly on
global frame indices.
"""

from __future__ import annotations

import numpy as np

from ..config import AlignerHyperParams, Wav2Vec2ModelConfig
from ..types import AlignmentOutput
from .grouping import frame_evidence_from_log_probs, group_into_words
from .tokenization import build_token_sequence_case_aware


def chunk_spans(
    n_samples: int, chunk_samples: int, overlap_samples: int, stride: int
) -> list[tuple[int, int]]:
    """Frame-aligned (start, end) sample spans with overlap."""
    chunk_samples = (chunk_samples // stride) * stride
    overlap_samples = (overlap_samples // stride) * stride
    assert 0 < overlap_samples < chunk_samples
    hop = chunk_samples - overlap_samples
    spans = []
    start = 0
    while True:
        end = min(start + chunk_samples, n_samples)
        spans.append((start, end))
        if end >= n_samples:
            break
        start += hop
    return spans


def stitch_log_probs(
    chunk_log_probs: list[np.ndarray],
    spans: list[tuple[int, int]],
    stride: int,
    total_frames: int,
) -> np.ndarray:
    """Assemble the global [T_total, V] matrix: each global frame comes from
    the chunk whose window-center is closest (deepest context)."""
    v = chunk_log_probs[0].shape[1]
    out = np.zeros((total_frames, v), np.float32)
    best_depth = np.full(total_frames, -1, np.int64)
    for lp, (s0, _) in zip(chunk_log_probs, spans):
        f0 = s0 // stride
        n_f = lp.shape[0]
        count = min(n_f, total_frames - f0)
        if count <= 0:
            continue
        local = np.arange(count)
        depth = np.minimum(local, n_f - 1 - local)
        sel = depth > best_depth[f0 : f0 + count]
        best_depth[f0 : f0 + count][sel] = depth[sel]
        out[f0 : f0 + count][sel] = lp[:count][sel]
    return out


def stitch_indices(
    n_frames: list[int],
    spans: list[tuple[int, int]],
    stride: int,
    total_frames: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(chunk_idx, local_idx) int32 per global frame — the same
    deepest-context selection `stitch_log_probs` applies to values, computed
    on indices alone so the stitch itself can run as ONE device gather
    (`log_probs[chunk_idx, local_idx, :]`) without the [T_total, V] matrix
    ever visiting the host. Host cost is O(T_total) integers."""
    chunk_idx = np.zeros(total_frames, np.int32)
    local_idx = np.zeros(total_frames, np.int32)
    best_depth = np.full(total_frames, -1, np.int64)
    for ci, (n_f, (s0, _)) in enumerate(zip(n_frames, spans)):
        f0 = s0 // stride
        count = min(n_f, total_frames - f0)
        if count <= 0:
            continue
        local = np.arange(count)
        depth = np.minimum(local, n_f - 1 - local)
        sel = depth > best_depth[f0 : f0 + count]
        best_depth[f0 : f0 + count][sel] = depth[sel]
        chunk_idx[f0 : f0 + count][sel] = ci
        local_idx[f0 : f0 + count][sel] = local[sel].astype(np.int32)
    return chunk_idx, local_idx


def align_longform(
    audio: np.ndarray,
    transcript: str,
    params: dict,
    model_cfg: Wav2Vec2ModelConfig,
    vocab: dict[str, int],
    chunk_sec: float = 30.0,
    overlap_sec: float = 5.0,
    sample_rate: int = 16000,
    compute_dtype: str = "float32",
    hp: AlignerHyperParams | None = None,
    mesh=None,
    max_chunk_batch: int = 32,
) -> AlignmentOutput:
    """Align arbitrarily long audio against its transcript.

    `mesh` shards the CHUNK batch over the 'data' axis — the sequence-
    parallel dimension for long-form audio (each chunk is independent until
    the stitched DP, so chunk-parallelism needs no ring attention at this
    model scale; SURVEY.md §2.8 SP row).

    Single-device (mesh=None), the whole log-prob lifecycle is
    device-resident: chunk log-probs stay on chip, the overlap stitch is ONE
    gather driven by host-computed indices (`stitch_indices`), the DP reads
    the stitched [T_total, V] matrix in place, and grouping evidence comes
    back as four T-length vectors (ops/evidence.py). Host↔device traffic is
    the audio up + O(T) down — the reference's D2H of the full logits matrix
    (cuda_forward.rs:50-69) would be ~282 MB at 60 min × V=392; over this
    machine's TPU tunnel that round-trip dominated the hour-scale wall
    (71.9 s → see BENCHMARKS.md long-form table). Under a mesh the chunk
    batch is sharded, so the stitch crosses shards; that path keeps the
    host-side stitch."""
    import jax
    import jax.numpy as jnp

    from ..models.ctc_model import log_softmax_logits, make_forward_fn
    from ..ops.evidence import compute_frame_evidence_device
    from ..ops.viterbi_pallas import fits_vmem, on_tpu
    from ..ops.viterbi_pallas import viterbi_pallas_single, viterbi_pallas_single_hbm
    from ..ops.viterbi_ref import viterbi_single
    from ..pipeline.runtime import normalize_audio

    hp = hp or AlignerHyperParams()
    blank_id = model_cfg.pad_token_id
    word_sep_id = vocab.get("|", 0)
    # samples per output frame — covers the mel frontend (w2v-BERT) and
    # adapter-downsampled models too, not just prod(conv_stride)
    stride = model_cfg.frame_stride_samples()
    stride_ms = model_cfg.frame_stride_ms(sample_rate)

    # tokenize FIRST (audio-independent): empty transcripts/audio and
    # unalignable transcripts must not pay hour-scale encoder forwards or
    # return garbage (runtime.py's empty-input + min-frames contracts)
    seq = build_token_sequence_case_aware(transcript, vocab, blank_id, word_sep_id)
    if len(audio) == 0 or not seq.normalized_words:
        return AlignmentOutput(words=[])
    min_frames = -(-len(seq.tokens) // 2)
    if model_cfg.conv_output_length(len(audio)) < min_frames:
        from ..errors import InvalidInputError

        raise InvalidInputError(
            f"audio too short for transcript: "
            f"{model_cfg.conv_output_length(len(audio))} frames < "
            f"{min_frames} required"
        )

    normalized = normalize_audio(audio)
    n = len(normalized)
    chunk_samples = int(chunk_sec * sample_rate)
    overlap_samples = int(overlap_sec * sample_rate)

    dtype = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    fwd = make_forward_fn(model_cfg, compute_dtype=dtype)

    # mesh=None: log-probs never visit the host (device gather stitch +
    # device DP + device evidence reductions). Under a mesh the chunk batch
    # is sharded across devices, so stitch/DP pull to host as before.
    device_resident = mesh is None

    if n <= chunk_samples:
        logits = fwd(params, jnp.asarray(normalized)[None, :])
        log_probs = log_softmax_logits(logits)[0]
        if not device_resident:
            log_probs = np.asarray(log_probs)
    else:
        spans = chunk_spans(n, chunk_samples, overlap_samples, stride)
        # padded batches over the chunks (bucketed forward); hour-scale
        # audio produces 100+ chunks, so the forward runs in sub-batches of
        # max_chunk_batch to bound activation memory (attention scores are
        # O(B * T_chunk^2))
        n_pad = max(s1 - s0 for s0, s1 in spans)
        batch = np.zeros((len(spans), n_pad), np.float32)
        lens = np.zeros(len(spans), np.int32)
        for i, (s0, s1) in enumerate(spans):
            batch[i, : s1 - s0] = normalized[s0:s1]
            lens[i] = s1 - s0

        def _forward_slice(batch_np, lens_np):
            """Device log-probs [rows, T_chunk_pad, V] for one sub-batch."""
            batch_dev, lens_dev = jnp.asarray(batch_np), jnp.asarray(lens_np)
            if mesh is not None:
                from ..parallel.mesh import batch_sharding

                bs = batch_sharding(mesh)
                data_size = mesh.shape.get("data", 1)
                pad_rows = (-batch_np.shape[0]) % data_size
                if pad_rows:
                    batch_np = np.concatenate(
                        [batch_np, np.zeros((pad_rows, n_pad), np.float32)]
                    )
                    lens_np = np.concatenate(
                        [lens_np, np.ones(pad_rows, np.int32)]
                    )
                batch_dev = jax.device_put(batch_np, bs)
                lens_dev = jax.device_put(lens_np, bs)
            logits = fwd(params, batch_dev, lens_dev)
            return log_softmax_logits(logits)

        total_frames = model_cfg.conv_output_length(n)
        blocks = []  # device path: per-sub-batch device arrays
        chunk_lps = []  # host path: trimmed per-chunk np arrays
        for lo in range(0, len(spans), max_chunk_batch):
            hi = min(lo + max_chunk_batch, len(spans))
            # keep the sub-batch shape constant (jit cache) by padding the
            # final slice with repeat rows
            rows = list(range(lo, hi)) + [hi - 1] * (
                max_chunk_batch - (hi - lo) if len(spans) > max_chunk_batch else 0
            )
            lp_all = _forward_slice(batch[rows], lens[rows])
            if device_resident:
                # trim repeat-padding rows so chunk i sits at concat row i
                blocks.append(lp_all[: hi - lo])
                continue
            lp_all = np.asarray(lp_all)
            for j, i in enumerate(range(lo, hi)):
                chunk_lps.append(
                    lp_all[j, : model_cfg.conv_output_length(int(lens[i]))]
                )
        if device_resident:
            # the stitch is ONE gather: host computes only the per-frame
            # (chunk, local-frame) index pair (deepest-context rule), the
            # [T_total, V] matrix itself never leaves the chip
            n_frames = [
                model_cfg.conv_output_length(int(lens[i]))
                for i in range(len(spans))
            ]
            c_idx, l_idx = stitch_indices(n_frames, spans, stride, total_frames)
            lps_all = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks)
            log_probs = lps_all[jnp.asarray(c_idx), jnp.asarray(l_idx), :]
            del lps_all, blocks
        else:
            log_probs = stitch_log_probs(chunk_lps, spans, stride, total_frames)

    t_len = log_probs.shape[0]
    s_len = len(seq.tokens)
    if not on_tpu():
        vit = viterbi_single
    elif fits_vmem(t_len, s_len):
        vit = viterbi_pallas_single
    else:
        vit = viterbi_pallas_single_hbm  # hour-scale: bp streamed via HBM
    tokens_dev = jnp.asarray(seq.tokens, jnp.int32)
    lp_dev = log_probs if device_resident else jnp.asarray(log_probs)
    path_dev = vit(lp_dev, tokens_dev, jnp.int32(t_len), jnp.int32(s_len))
    if device_resident:
        # grouping needs only four per-frame reductions — computed on device,
        # so what crosses the tunnel is O(T), not T×V (same contract as the
        # serving path, ops/evidence.py)
        evidence = compute_frame_evidence_device(
            lp_dev, tokens_dev, path_dev, blank_id, t_len
        )
        path = np.asarray(path_dev)[:t_len]
    else:
        path = np.asarray(path_dev)[:t_len]
        evidence = frame_evidence_from_log_probs(
            log_probs, seq.tokens, path, blank_id
        )
    words = group_into_words(
        [(int(s), t) for t, s in enumerate(path)],
        seq.tokens, seq.chars, seq.normalized_words, evidence,
        blank_id, word_sep_id, stride_ms, hp,
    )
    return AlignmentOutput(words=words)
