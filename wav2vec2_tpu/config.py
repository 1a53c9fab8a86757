"""Configuration types.

Mirrors /root/reference/src/config.rs:5-76 (`Wav2Vec2Config`,
`Wav2Vec2ModelConfig` with the same HF config.json field set and defaults)
and additionally lifts the reference's compile-time tunables (expansion frame
budgets blank_expansion.rs:8-11, selector weights candidate_selector.rs:4-9,
calibration knots grouping/mod.rs:201-210, GPU dispatch threshold
viterbi.rs:9-10) into `AlignerHyperParams`, keeping the same defaults for
output parity — per SURVEY.md §5 "Config / flag system".
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from .errors import IoError, JsonError

DEFAULT_SAMPLE_RATE_HZ = 16_000


@dataclass
class Wav2Vec2Config:
    """User-facing aligner configuration (reference: config.rs:5-28)."""

    model_path: str = ""
    config_path: str = ""
    vocab_path: str = ""
    device: str = "tpu"  # "tpu" | "cpu" (reference used "cpu"/"cuda")
    expected_sample_rate_hz: int = DEFAULT_SAMPLE_RATE_HZ


@dataclass
class Wav2Vec2ModelConfig:
    """Deserialized HF `config.json` (reference: config.rs:30-76)."""

    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    conv_dim: list[int]
    conv_kernel: list[int]
    conv_stride: list[int]
    num_conv_pos_embeddings: int
    num_conv_pos_embedding_groups: int
    pad_token_id: int
    vocab_size: int
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    dtype: Optional[str] = None
    feat_extract_norm: str = "layer"
    conv_bias: bool = True
    # HuBERT compatibility (HubertConfig.feat_proj_layer_norm): the CTC
    # graph is otherwise identical to wav2vec2's, so hubert checkpoints
    # load through the same pipeline (see models/params.py prefix handling)
    feat_proj_layer_norm: bool = True
    # data2vec-audio compatibility: its positional embedding is a STACK of
    # num_conv_pos_embeddings smaller grouped convs (kernel
    # conv_pos_kernel_size, non-affine LayerNorm + GELU each) instead of
    # one weight-normed conv; detected from config.json model_type
    pos_conv_style: str = "wav2vec2"  # "wav2vec2" | "data2vec"
    conv_pos_kernel_size: int = 19
    # MMS compatibility (Wav2Vec2Config.adapter_attn_dim): per-layer
    # attention adapters; the per-language weights are merged into the
    # checkpoint at export time (scripts/export_hf_model.py --target-lang)
    adapter_attn_dim: Optional[int] = None
    # WavLM compatibility: gated relative-position-bias attention
    # (T5-style buckets; bias from layer 0's embedding, per-layer gates);
    # detected from config.json model_type
    attention_style: str = "wav2vec2"  # "wav2vec2" | "wavlm" | "deberta"
    num_buckets: int = 320
    max_bucket_distance: int = 800
    # HuBERT compatibility (HubertConfig.conv_pos_batch_norm, e.g.
    # mHuBERT-147): the positional conv input is batch-normalized instead of
    # the conv weight being weight-normed; inference folds the running stats
    # into a per-channel affine at load time (models/params.py)
    conv_pos_batch_norm: bool = False
    # wav2vec2 conv adapter (Wav2Vec2Config.add_adapter): a stack of
    # stride-`adapter_stride` GLU convs after the encoder that downsamples
    # the frame rate by adapter_stride**num_adapter_layers (the lm_head then
    # reads output_hidden_size channels)
    add_adapter: bool = False
    adapter_kernel_size: int = 3
    adapter_stride: int = 2
    num_adapter_layers: int = 3
    output_hidden_size: Optional[int] = None
    # SEW / SEW-D compatibility (SEWConfig.squeeze_factor): the encoder runs
    # at a squeeze_factor-pooled frame rate (avg-pool + strided pos-conv)
    # and a linear upsampler restores the conv frame rate afterwards;
    # detected from config.json model_type ("sew" sets encoder_style only,
    # "sew-d" also sets attention_style="deberta")
    encoder_style: str = "wav2vec2"  # "wav2vec2" | "sew"
    squeeze_factor: int = 1
    # SEW-D DeBERTa-v2 attention knobs (SEWDConfig); layer_norm_eps is 1e-7
    # inside the SEW-D encoder while the feature path keeps 1e-5, hence the
    # separate feature_layer_norm_eps (None = use layer_norm_eps)
    feature_layer_norm_eps: Optional[float] = None
    position_buckets: int = 256
    max_position_embeddings: int = 512
    share_att_key: bool = True
    pos_att_type: tuple = ("p2c", "c2p")
    norm_rel_ebd: str = "layer_norm"
    # Wav2Vec2-Conformer compatibility (Wav2Vec2ConformerConfig): conformer
    # blocks (FFN-half / self-attn / depthwise-conv module / FFN-half) with
    # rotary or Transformer-XL relative position embeddings; detected from
    # config.json model_type ("wav2vec2-conformer" sets
    # encoder_style="conformer"). hidden_act is read for the conformer FFN +
    # conv-module activation (released conformer checkpoints use "swish");
    # the other families always ship hidden_act="gelu".
    position_embeddings_type: str = "relative"  # "relative"|"rotary"|"none"
    rotary_embedding_base: int = 10000
    max_source_positions: int = 5000
    conv_depthwise_kernel_size: int = 31
    hidden_act: str = "gelu"
    # Wav2Vec2-BERT (w2v-BERT 2.0, Wav2Vec2BertConfig): log-mel frontend
    # instead of the conv feature extractor (models/mel.py), conformer
    # blocks with a causal depthwise conv + LayerNorm (no BatchNorm),
    # "relative_key" clamped-distance-embedding attention, optional
    # intermediate FFN and a conformer-style downsampling adapter; detected
    # from config.json model_type ("wav2vec2-bert" sets
    # encoder_style="conformer_bert" and frontend_style="mel")
    frontend_style: str = "conv"  # "conv" | "mel"
    feature_projection_input_dim: int = 160
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    use_intermediate_ffn_before_adapter: bool = False
    adapter_act: str = "relu"
    # serving-path switch (not a checkpoint field): route encoder attention
    # through the fused Pallas kernel (ops/flash_attention.py). Set by
    # BatchAligner on TPU without a mesh; part of the jit cache key via
    # _FrozenCfg so flipping it retraces.
    use_flash_attention: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "Wav2Vec2ModelConfig":
        required = [
            "hidden_size", "num_hidden_layers", "num_attention_heads",
            "intermediate_size", "conv_dim", "conv_kernel", "conv_stride",
            "num_conv_pos_embeddings", "num_conv_pos_embedding_groups",
            "pad_token_id", "vocab_size",
        ]
        if d.get("model_type") == "wav2vec2-bert":
            # the mel frontend has no conv stack — Wav2Vec2BertConfig ships
            # none of the conv_* fields
            d = {**{"conv_dim": [], "conv_kernel": [], "conv_stride": [],
                    "num_conv_pos_embeddings": 0,
                    "num_conv_pos_embedding_groups": 1}, **d}
        missing = [k for k in required if k not in d]
        if missing:
            raise JsonError("parse config.json", f"missing fields: {missing}")
        kwargs = {k: d[k] for k in required}
        for opt in ["do_stable_layer_norm", "layer_norm_eps", "dtype",
                    "feat_extract_norm", "conv_bias", "feat_proj_layer_norm",
                    "pos_conv_style", "conv_pos_kernel_size",
                    "adapter_attn_dim", "attention_style", "num_buckets",
                    "max_bucket_distance", "conv_pos_batch_norm",
                    "add_adapter", "adapter_kernel_size", "adapter_stride",
                    "num_adapter_layers", "output_hidden_size",
                    "encoder_style", "squeeze_factor",
                    "feature_layer_norm_eps", "position_buckets",
                    "max_position_embeddings", "share_att_key",
                    "norm_rel_ebd", "rotary_embedding_base",
                    "max_source_positions", "conv_depthwise_kernel_size",
                    "hidden_act", "feature_projection_input_dim",
                    "left_max_position_embeddings",
                    "right_max_position_embeddings",
                    "use_intermediate_ffn_before_adapter", "adapter_act"]:
            if opt in d and d[opt] is not None:
                kwargs[opt] = d[opt]
        if "pos_att_type" in d and d["pos_att_type"] is not None:
            kwargs["pos_att_type"] = tuple(d["pos_att_type"])
        if d.get("model_type") == "data2vec-audio":
            kwargs["pos_conv_style"] = "data2vec"
        if d.get("model_type") == "wavlm":
            kwargs["attention_style"] = "wavlm"
        if d.get("model_type") in ("sew", "sew-d"):
            kwargs["encoder_style"] = "sew"
            kwargs.setdefault("squeeze_factor", 2)
        if d.get("model_type") == "sew-d":
            kwargs["attention_style"] = "deberta"
            # SEWDConfig's feature-path norms keep their own epsilon (the
            # encoder's layer_norm_eps is 1e-7)
            kwargs.setdefault("feature_layer_norm_eps", 1e-5)
        if d.get("model_type") == "wav2vec2-conformer":
            kwargs["encoder_style"] = "conformer"
            # Wav2Vec2ConformerConfig allows position_embeddings_type=None
            # (absolute-position-free attention); normalize to "none"
            kwargs["position_embeddings_type"] = (
                d.get("position_embeddings_type") or "none"
            )
        if d.get("model_type") == "wav2vec2-bert":
            kwargs["encoder_style"] = "conformer_bert"
            kwargs["frontend_style"] = "mel"
            kwargs["position_embeddings_type"] = (
                d.get("position_embeddings_type") or "none"
            )
            kwargs.setdefault("hidden_act", "swish")
            # Wav2Vec2BertConfig defaults that differ from wav2vec2's
            # (num_adapter_layers 1 vs 3; output_hidden_size follows
            # hidden_size when unset)
            kwargs.setdefault("num_adapter_layers", 1)
            if kwargs.get("output_hidden_size") is None:
                kwargs["output_hidden_size"] = d["hidden_size"]
        # UniSpeech / UniSpeech-SAT share wav2vec2's CTC graph exactly
        # (transformers modular_unispeech{,_sat}.py: every module inherits
        # the Wav2Vec2 one) — only the checkpoint prefix differs, handled in
        # models/params.py; no config fields change here.
        return cls(**kwargs)

    @classmethod
    def load(cls, path: str | Path) -> "Wav2Vec2ModelConfig":
        try:
            data = Path(path).read_text()
        except OSError as e:
            raise IoError("read config.json", e) from e
        try:
            d = json.loads(data)
        except json.JSONDecodeError as e:
            raise JsonError("parse config.json", e) from e
        return cls.from_dict(d)

    def frame_stride_ms(self, sample_rate: int) -> float:
        """Frame stride in ms = product(conv_stride) / sample_rate * 1000
        (reference: config.rs:72-75; = 20 ms for wav2vec2 at 16 kHz).

        add_adapter models emit adapter_stride**num_adapter_layers-coarser
        frames (the GLU conv stack downsamples after the encoder); SEW's
        squeeze/upsample cancels out (the upsampler restores the conv rate).
        The mel frontend (w2v-BERT) emits 160-sample hops stacked ×2
        (= 20 ms at 16 kHz, same as wav2vec2's conv stack).
        """
        return self.frame_stride_samples() / sample_rate * 1000.0

    def frame_stride_samples(self) -> int:
        """Input samples per OUTPUT frame (includes the mel hop×stack and
        any adapter downsampling) — the chunk-alignment unit the long-form
        and online paths need (= 320 for wav2vec2 and the mel frontend at
        16 kHz; × adapter_stride**num_adapter_layers with add_adapter)."""
        if getattr(self, "frontend_style", "conv") == "mel":
            stride_samples = 160 * 2
        else:
            stride_samples = 1
            for s in self.conv_stride:
                stride_samples *= s
        if self.add_adapter:
            stride_samples *= self.adapter_stride ** self.num_adapter_layers
        return stride_samples

    def conv_output_length(self, num_samples: int) -> int:
        """Number of output frames T produced by the model for `num_samples`
        input samples (no padding, per conv layer: floor((L - K)/stride) + 1;
        adapter layers use HF's (L - 1)//stride + 1, exact for their
        kernel-3/pad-1 convs)."""
        if getattr(self, "frontend_style", "conv") == "mel":
            # 25 ms/10 ms frames (center=False), stacked ×2 (models/mel.py)
            length = (
                (1 + (num_samples - 400) // 160) // 2
                if num_samples >= 400 else 0
            )
        else:
            length = num_samples
            for k, s in zip(self.conv_kernel, self.conv_stride):
                length = (length - k) // s + 1
        if self.add_adapter:
            for _ in range(self.num_adapter_layers):
                if getattr(self, "frontend_style", "conv") == "mel":
                    length = (
                        length + 2 * (self.adapter_stride // 2)
                        - self.adapter_kernel_size
                    ) // self.adapter_stride + 1
                else:
                    length = (length - 1) // self.adapter_stride + 1
        return max(length, 0)


@dataclass(frozen=True)
class ExpansionPolicyConfig:
    """One blank-expansion policy's frame budgets
    (reference: blank_expansion.rs:39-64)."""

    name: str
    max_left_expansion_frames: int
    max_right_pullback_frames: int
    min_interior_silence_frames: int


@dataclass
class AlignerHyperParams:
    """All alignment tunables the reference hard-codes, with identical
    defaults (SURVEY.md §5: lift constants into a config dataclass)."""

    # blank_expansion.rs:8-11 + config_for():46-64
    expansion_policies: tuple[ExpansionPolicyConfig, ...] = (
        ExpansionPolicyConfig("balanced", 12, 6, 4),
        ExpansionPolicyConfig("conservative_start", 10, 2, 6),
        ExpansionPolicyConfig("aggressive_tail", 16, 4, 2),
    )
    # candidate_selector.rs:4-9
    weight_boundary_confidence: float = 3.2
    weight_boundary_shift: float = 0.8
    weight_pause_plausibility: float = 1.3
    large_gap_threshold_frames: int = 8
    overlap_penalty_per_frame: float = 12.0
    near_collapse_penalty: float = 4.0
    # grouping/mod.rs:163-194 composite confidence weights
    weight_geo_mean: float = 0.40
    weight_margin: float = 0.30
    weight_p10: float = 0.20
    weight_boundary: float = 0.10
    # grouping/mod.rs:200-226 calibration knots
    calibration_knots: tuple[tuple[float, float], ...] = (
        (0.00, 0.02), (0.20, 0.12), (0.35, 0.28), (0.50, 0.50),
        (0.65, 0.72), (0.80, 0.88), (0.95, 0.97), (1.00, 0.99),
    )
    # viterbi.rs:9-10 — T*S below which the host numpy oracle runs instead
    # of the fused device DP (launch-overhead analog). The reference's GPU
    # value was 40_000; re-measured on TPU (BENCHMARKS.md dispatch table):
    # the host oracle is linear (~1 ms / 1k cells) while the fused device
    # path is flat at one dispatch+fetch round-trip, crossing at ~25-30k
    # cells even through this machine's ~30 ms tunnel. PCIe-attached hosts
    # (sub-ms dispatch) should tune this down to ~3_000.
    kernel_dp_threshold: int = 25_000


def load_vocab(path: str | Path, single_char_only: bool = True) -> dict[str, int]:
    """Load HF vocab.json keeping only single-character keys
    (reference: builder.rs:98-115). Phoneme-CTC vocabs carry
    multi-codepoint symbols ("ɛ̃", "tʃ") — tokenizers that look symbols up
    verbatim (PhonemeTokenizer) load with single_char_only=False."""
    try:
        data = Path(path).read_text()
    except OSError as e:
        raise IoError("read vocab.json", e) from e
    try:
        raw = json.loads(data)
    except json.JSONDecodeError as e:
        raise JsonError("parse vocab.json", e) from e
    if single_char_only:
        return {k: int(v) for k, v in raw.items() if len(k) == 1}
    return {k: int(v) for k, v in raw.items()}
