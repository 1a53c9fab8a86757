"""Fused attention (flash-style) — Pallas TPU kernel.

Replaces the XLA einsum attention of the encoder stacks
(models/encoder.py `_self_attention` / `_conformer_attention`) for the
serving path WHERE MEASURED FASTER — see `use_flash` for the dispatch
rule. Two properties over the XLA formulation (reference analog: the
encoder matmuls the Candle backend runs dense, encoder.rs:60-110 — the
reference has no fused-attention equivalent; this is TPU-native headroom):

1. **No [B, H, T, T] score tensor in HBM.** Scores for one BLOCK_Q-row
   query tile live in VMEM, softmax is computed there in f32, and only the
   [BLOCK_Q, hd] output leaves the kernel. The bf16 serving path previously
   paid write+read of the score grid per layer (the measured 47.4→34.4 ms
   bf16-scores win in `_self_attention` was about halving exactly this
   traffic; the kernel removes it entirely) — and the f32 parity path paid
   double that. In practice XLA's own attention fusion already keeps this
   traffic off the critical path at serving shapes (measured: the kernel
   LOSES for plain/rotary attention — reports/flash_ab_r5.jsonl), so this
   property alone does not justify dispatching to the kernel.

2. **The Transformer-XL relative-position term at materialized-form FLOPs
   with factorized-form traffic — the measured win.** The conformer
   rel-pos score bd[i,k] = (q_i + bias_v)·W_pos·pe_{i−k} was previously
   computed with the exact U·G factorization (models/encoder.py): zero
   wide tensors, but the U·G contraction has inner dimension H = nh·hd —
   nh/2× (8× for the large model's 16 heads) the FLOPs of the
   per-diagonal form. In-kernel, the per-diagonal form is affordable:
   each (i-tile, all-keys) program takes one [BLOCK_Q, hd] ×
   [hd, T_pad+BLOCK_Q] MXU matmul against a REVERSED projected-encoding
   window, then realigns diagonals to the (q, k) grid with a shear —
   8 masked static `pltpu.roll`s (shift 1, 2, …, 128 by query row bit)
   entirely in VMEM. Per layer this removes the a_bar/U [B, nh, T, H]
   intermediates (~0.5 GB each at B=32, T=499) AND ~85% of the
   position-term FLOPs. Measured on TPU v5e: conformer rel-pos
   880.4× → 1238.1× realtime (reports/family_throughput_r4{,_flash}.jsonl).

Layout / semantics:
- q, k, v: [B, NH, T, hd]; T is padded to a BLOCK_Q multiple inside the
  wrapper, padded keys masked with −inf additive bias, padded query rows
  sliced off on return (their outputs are softmax-over-valid-keys noise,
  same as the XLA path's).
- softmax is always f32 (the XLA bf16 path rounds scores to bf16; the
  kernel is strictly more accurate there, and matches the f32 path to
  reassociation).
- the relative table is prepared per layer by `rel_table_rev`:
  R_rev[h, m, :] = (pe_{T_pad−m} · W_pos)[h·hd : (h+1)·hd], m ∈ [0, 2·T_pad)
  (row m=0 ⇔ distance d=T_pad is never read — the per-program window for
  query tile i0 is rows [T_pad−i0−BLOCK_Q, T_pad−i0+T_pad), exactly
  covering d ∈ [i0−T_pad+1, i0+BLOCK_Q−1]).

Shear correctness: with G[c] = r_{i0+BLOCK_Q−c}, the position matmul gives
p2[ii, c] = q̂_ii·r_{i0+BLOCK_Q−c}; rolling row ii right by ii yields
p2s[ii, c] = p2[ii, c−ii] so
p2s[ii, BLOCK_Q+k] = q̂_ii·r_{(i0+ii)−k} = bd[ii, k].
Columns read satisfy c−ii ≥ 1, so the rolls' wraparound never contaminates.

Dispatch: `use_flash(...)` encodes the measured win table (rel-pos only)
plus a per-program VMEM byte budget as a function of (T, head_dim, dtype,
rel) and the head_dim ≤ 128 lane cap; everything else runs the XLA path.
Set WAV2VEC2_FLASH_FORCE=1 to force the kernel where it is merely legal
(A/B benchmarking — scripts/bench_models.py --flash). Like ops/viterbi_pallas.py, CPU
tests run `interpret=True`.

SPMD: a `pallas_call` cannot be GSPMD-partitioned, so under a device mesh
`flash_attention` accepts `spmd_mesh` (a `jax.sharding.AbstractMesh` with
the framework's ('data', 'model') axes, threaded through the frozen model
config by parallel/batching.py) and wraps the launch in `jax.shard_map`:
batch shards over 'data', heads over 'model' — attention is embarrassingly
parallel across both, so the per-shard kernel is unchanged and no
collectives are inserted.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

LANE = 128
BLOCK_Q = 256
# per-program VMEM residency budget (see vmem_bytes): leave headroom under
# the ~16 MB/core VMEM of current TPU parts for Mosaic's own scratch
VMEM_BUDGET = 12 * 2**20

FORCE_ENV = "WAV2VEC2_FLASH_FORCE"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_len(t: int) -> int:
    return _round_up(max(t, BLOCK_Q), BLOCK_Q)


def _roll(x, k, interpret):
    # interpret mode (CPU tests) lacks the TPU roll primitive; jnp.roll is
    # semantically identical (positive shift moves toward higher indices).
    # Branch explicitly so a genuine Mosaic failure on the TPU path raises
    # instead of being silently lowered through jnp.roll's slower codegen.
    if interpret:
        return jnp.roll(x, k, axis=1)
    return pltpu.roll(x, k, axis=1)


def _shear_right_by_row(p2, interpret):
    """p2s[ii, c] = p2[ii, c − ii] for ii ∈ [0, BLOCK_Q): 8 masked static
    rolls (binary decomposition of the per-row shift), all VPU work in
    VMEM."""
    rows = jax.lax.broadcasted_iota(jnp.int32, p2.shape, 0)
    b = 1
    while b < BLOCK_Q:
        p2 = jnp.where((rows & b) != 0, _roll(p2, b, interpret), p2)
        b *= 2
    return p2


def _attn_kernel(*refs, scale: float, have_mask: bool, rel: bool,
                 t_pad: int, interpret: bool):
    if rel:
        qc_ref, qp_ref, k_ref, v_ref, r_ref = refs[:5]
        rest = refs[5:]
    else:
        qc_ref, k_ref, v_ref = refs[:3]
        rest = refs[3:]
    m_ref = rest[0] if have_mask else None
    o_ref = rest[-1]

    q = qc_ref[0, 0]  # [BLOCK_Q, hd]
    k = k_ref[0, 0]   # [T_pad, hd]
    # f32 operands: force true-f32 MXU passes (the default TPU matmul
    # precision rounds operands to bf16 — fine for the bf16 serving path,
    # wrong for the f32 parity path); bf16 operands are single-pass anyway
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # [BLOCK_Q, T_pad]

    if rel:
        i = pl.program_id(2)
        qp = qp_ref[0, 0]
        m0 = pl.multiple_of(t_pad - i * BLOCK_Q - BLOCK_Q, BLOCK_Q)
        g = r_ref[0, pl.ds(m0, t_pad + BLOCK_Q), :]  # [T_pad+BLOCK_Q, hd]
        p2 = jax.lax.dot_general(
            qp, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [BLOCK_Q, T_pad+BLOCK_Q]
        # the shear stays f32: a bf16 shear would halve its VPU traffic
        # (the kernel's dominant non-MXU cost) but Mosaic's tpu.dynamic_rotate
        # only supports 32-bit element types ("Rotate with non-32-bit data",
        # measured round 5), and the binary decomposition's odd shift (b=1)
        # rules out packing bf16 pairs into i32 lanes
        s = s + _shear_right_by_row(p2, interpret)[:, BLOCK_Q:]

    s = s * jnp.float32(scale)
    if have_mask:
        s = s + m_ref[0]  # [1, T_pad] broadcasts over query rows

    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    attn = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)
    o = jax.lax.dot_general(
        attn, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def rel_table_rev(w_pos_kernel: jnp.ndarray, nh: int, t_pad: int,
                  dtype) -> jnp.ndarray:
    """Reversed projected relative-position table [NH, 2·T_pad, hd].

    pe_d is the Transformer-XL sinusoid (pe_d[2m] = sin(d·w_m),
    pe_d[2m+1] = cos(d·w_m), w_m = 10000^{−2m/H}) — the same encoding the
    factorized XLA path expands via angle-difference identities
    (models/encoder.py `_conformer_attention` style="relative").
    w_pos_kernel: [H(in: pe component), H(out: nh·hd)].
    Row m holds distance d = T_pad − m, so per-query-tile windows are
    contiguous (module docstring)."""
    h = w_pos_kernel.shape[0]
    # the table is a trace-time CONSTANT: build it host-side in f64 (XLA's
    # f32 sin costs ~3e-4 absolute at |angle|≈T and would dominate the
    # kernel-vs-oracle gap; numpy f64 reduces the table to f32 rounding)
    pe = _pe_table(t_pad, h)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    r = jnp.dot(jnp.asarray(pe, dtype), w_pos_kernel.astype(dtype),
                preferred_element_type=dtype, precision=prec)
    return r.reshape(2 * t_pad, nh, h // nh).transpose(1, 0, 2)


@functools.lru_cache(maxsize=8)
def _pe_table(t_pad: int, h: int):
    import numpy as np

    d_vec = (t_pad - np.arange(2 * t_pad, dtype=np.float64))[:, None]
    inv = np.exp(np.arange(0, h, 2, dtype=np.float64)
                 * (-math.log(10000.0) / h))
    ang = d_vec * inv[None, :]  # [2·T_pad, H/2]
    return np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(
        2 * t_pad, h
    ).astype(np.float32)


def flash_forced() -> bool:
    """WAV2VEC2_FLASH_FORCE=1 forces the kernel wherever it is legal —
    the A/B benchmarking escape hatch (scripts/bench_models.py --flash); never set in
    production."""
    return os.environ.get(FORCE_ENV, "") == "1"


def vmem_bytes(t: int, head_dim: int, dtype=jnp.bfloat16,
               rel: bool = False) -> int:
    """Estimated per-program VMEM residency of one kernel instance.

    Counts every buffer that scales with (T_pad, hd, dtype): k/v (and the
    reversed rel table window) at 2× for Mosaic's input double-buffering,
    the q (and q_pos) tiles, the f32 score + exp tiles (plus the p2 and
    sheared copies for rel), and the double-buffered output tile."""
    t_pad = pad_len(t)
    item = jnp.dtype(dtype).itemsize
    kv = 2 * 2 * t_pad * head_dim * item            # k + v, double-buffered
    q = (2 if rel else 1) * 2 * BLOCK_Q * head_dim * item
    scores = 2 * BLOCK_Q * t_pad * 4                # s + e, f32
    out = 2 * BLOCK_Q * head_dim * item
    if rel:
        kv += 2 * 2 * t_pad * head_dim * item       # reversed table window
        scores += 2 * BLOCK_Q * (t_pad + BLOCK_Q) * 4  # p2 + sheared copy
    return kv + q + scores + out


def use_flash(t: int, head_dim: int, rel: bool = False,
              dtype=jnp.bfloat16) -> bool:
    """Static dispatch — the measured win table plus hardware legality.

    Measured on TPU v5e at the serving shapes (reports/flash_ab_r5.jsonl;
    the reference applies the same measure-then-threshold discipline to its
    DP dispatch, viterbi.rs:9-10): the kernel wins ONLY for the
    Transformer-XL relative-position style (per-diagonal bd term, module
    docstring §2 — conformer rel-pos 880→1238× realtime); for plain and
    rotary attention XLA's fused attention is faster at every measured
    (B, T) this pipeline produces (wav2vec2-base B=64, T=499: 5606× XLA vs
    4806× flash). Legality: head_dim within one 128-lane tile and the
    per-program buffers within the VMEM byte budget (a function of dtype —
    an f32/hd=128/T_pad=4096 launch would exceed 16 MB and fail in Mosaic
    rather than fall back)."""
    if head_dim > LANE:
        return False
    if vmem_bytes(t, head_dim, dtype, rel) > VMEM_BUDGET:
        return False
    return rel or flash_forced()


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray | None = None,
    *,
    q_pos: jnp.ndarray | None = None,
    rel_r: jnp.ndarray | None = None,
    scale: float = 1.0,
    interpret: bool | None = None,
    spmd_mesh=None,
) -> jnp.ndarray:
    """Fused attention. q, k, v: [B, NH, T, hd] (q may be pre-scaled by the
    caller — `scale` multiplies the summed scores before softmax, matching
    the conformer's (ac+bd)/sqrt(hd) op order). mask_bias: [B, T] additive
    f32 key mask (0 / −inf). For the Transformer-XL term pass q_pos
    (q + pos_bias_v, same shape as q) and rel_r from `rel_table_rev`
    (built at T_pad = pad_len(T)). `spmd_mesh`: an AbstractMesh with
    ('data', 'model') axes — the launch runs under `jax.shard_map` with
    batch sharded over 'data' and heads over 'model' (module docstring
    SPMD note). Returns [B, NH, T, hd] in q.dtype."""
    b, nh, t, hd = q.shape
    rel = rel_r is not None
    assert (q_pos is None) == (rel_r is None)
    if interpret is None:
        interpret = not on_tpu()  # CPU tests run the interpreter
    t_pad = pad_len(t)
    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if q_pos is not None:
            q_pos = jnp.pad(q_pos, pad)
        key_pad = jnp.full((b, t_pad - t), -jnp.inf, jnp.float32)
        mask_bias = jnp.concatenate(
            [jnp.zeros((b, t), jnp.float32) if mask_bias is None
             else mask_bias.astype(jnp.float32),
             key_pad],
            axis=1,
        )
    elif mask_bias is not None:
        mask_bias = mask_bias.astype(jnp.float32)
    have_mask = mask_bias is not None

    if rel:
        assert rel_r.shape == (nh, 2 * t_pad, hd), (rel_r.shape, t_pad)

    kernel = functools.partial(
        _attn_kernel, scale=float(scale), have_mask=have_mask, rel=rel,
        t_pad=t_pad, interpret=bool(interpret),
    )

    # arg order mirrors the kernel's ref order (q[, q_pos], k, v[, rel_r]
    # [, mask]); `launch` rebuilds specs from its (possibly shard-local)
    # shapes so the same body serves both the direct and shard_map paths
    args = [q]
    if rel:
        args.append(q_pos)
    args += [k, v]
    if rel:
        args.append(rel_r)
    if have_mask:
        args.append(mask_bias.reshape(b, 1, t_pad))

    def launch(*a):
        b_l, nh_l = a[0].shape[0], a[0].shape[1]
        tile_spec = pl.BlockSpec(
            (1, 1, BLOCK_Q, hd), lambda bb, hh, ii: (bb, hh, ii, 0),
            memory_space=pltpu.VMEM,
        )
        full_spec = pl.BlockSpec(
            (1, 1, t_pad, hd), lambda bb, hh, ii: (bb, hh, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [tile_spec]
        if rel:
            in_specs.append(tile_spec)
        in_specs += [full_spec, full_spec]
        if rel:
            in_specs.append(pl.BlockSpec(
                (1, 2 * t_pad, hd), lambda bb, hh, ii: (hh, 0, 0),
                memory_space=pltpu.VMEM,
            ))
        if have_mask:
            # [B, 1, T_pad]: the block's last two dims match the array's
            # (Mosaic requires (8, 128)-divisible or exact-match trailing
            # dims)
            in_specs.append(pl.BlockSpec(
                (1, 1, t_pad), lambda bb, hh, ii: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ))
        return pl.pallas_call(
            kernel,
            grid=(b_l, nh_l, t_pad // BLOCK_Q),
            in_specs=in_specs,
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((b_l, nh_l, t_pad, hd), q.dtype),
            interpret=interpret,
        )(*a)

    if spmd_mesh is not None and math.prod(spmd_mesh.axis_sizes) > 1:
        dp = spmd_mesh.shape.get("data", 1)
        tp = spmd_mesh.shape.get("model", 1)
        if b % dp or nh % tp:
            raise ValueError(
                f"flash_attention under mesh: batch {b} must divide over "
                f"'data'={dp} and heads {nh} over 'model'={tp} — disable "
                "use_flash_attention for this (mesh, model) combination"
            )
        qspec = P("data", "model", None, None)
        in_specs = [qspec]
        if rel:
            in_specs.append(qspec)
        in_specs += [qspec, qspec]
        if rel:
            in_specs.append(P("model", None, None))
        if have_mask:
            in_specs.append(P("data", None, None))
        out = jax.shard_map(
            launch, mesh=spmd_mesh, in_specs=tuple(in_specs),
            out_specs=qspec, check_vma=False,
        )(*args)
    else:
        out = launch(*args)
    return out[:, :, :t, :] if t_pad != t else out


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
