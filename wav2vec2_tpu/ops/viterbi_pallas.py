"""Fused banded CTC Viterbi — Pallas TPU kernel.

The TPU equivalent of the reference's two native DP backends (CUDA
viterbi.cu:58-181 single-block kernel with shared-memory ping-pong rows, and
the WGSL single-workgroup shader viterbi.wgsl:26-127): ONE kernel runs the
whole T-step wavefront sequentially with the S states mapped onto vector
lanes, keeps the backpointer matrix in VMEM, performs the backtrace
in-kernel, and returns only the T-length state path — the "only the path
leaves the device" data-movement discipline (SURVEY.md §2.8).

DP semantics are identical to ops/viterbi_ref.py (band, tie-breaking,
final-state rule — viterbi.rs:50-156); the equivalence test asserts
bit-identical paths against the numpy oracle, the reference's own
gpu_matches_cpu pattern (viterbi_gpu.rs:328-347).

Layout notes:
- the emission matrix E[t, s] = log_probs[t, tokens[s]] is gathered by XLA
  outside the kernel (one fused gather);
- state rows are (1, S_pad) f32 with S_pad padded to a lane multiple (128);
  cross-lane shifts use pltpu.roll;
- dynamic lane extraction in the backtrace uses a one-hot reduction (TPU
  has no scalar dynamic vector extract);
- scalars (t_len, s_len) ride in SMEM.

Three tiers by static padded shape (see docs/kernel_design.md):
1. fully VMEM-resident (emissions + int32 backpointers ≤ ~12 MB);
2. emissions streamed from HBM in double-buffered 8-row blocks,
   backpointers still VMEM;
3. backpointers in HBM too, written back per block — unbounded T·S for
   hour-scale long-form audio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(row, k):
    # interpret mode (CPU tests) lacks the TPU roll primitive; jnp.roll is
    # semantically identical here
    try:
        return pltpu.roll(row, k, axis=1)
    except Exception:
        return jnp.roll(row, k, axis=1)


def _viterbi_kernel_resident(tlen_ref, slen_ref, emit_ref, tokneq_ref, path_ref, bp_ref):
    t_pad, s_pad = emit_ref.shape
    t_len = tlen_ref[0, 0]
    s_len = slen_ref[0, 0]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    neg = jnp.float32(-jnp.inf)

    # init row (viterbi.rs:62-65)
    emit0 = emit_ref[0:1, :]
    prev = jnp.where(s_idx == 0, emit0, neg)
    prev = jnp.where((s_idx == 1) & (s_len > 1), emit0, prev)
    final_floor = jnp.maximum(s_len - 2, 0)
    tokneq = tokneq_ref[0:1, :] != 0

    def shift(row, k):
        return jnp.where(s_idx >= k, _roll(row, k), neg)

    def forward_step(t, prev):
        remaining = t_len - 1 - t
        curr_start = jnp.maximum(final_floor - 2 * remaining, 0)
        curr_end = jnp.minimum(2 * t + 1, s_len - 1)
        emit = emit_ref[pl.ds(t, 1), :]

        cand1 = shift(prev, 1)
        cand2 = jnp.where(tokneq, shift(prev, 2), neg)
        best = prev
        step = jnp.zeros((1, s_pad), jnp.int32)
        m1 = cand1 > best
        best = jnp.where(m1, cand1, best)
        step = jnp.where(m1, 1, step)
        m2 = cand2 > best
        best = jnp.where(m2, cand2, best)
        step = jnp.where(m2, 2, step)

        in_band = (s_idx >= curr_start) & (s_idx <= curr_end)
        curr = jnp.where(in_band, best + emit, neg)
        bp_row = jnp.where(in_band, step, 0)

        active = t < t_len

        @pl.when(active)
        def _():
            bp_ref[pl.ds(t, 1), :] = bp_row

        return jnp.where(active, curr, prev)

    last = jax.lax.fori_loop(1, t_pad, forward_step, prev)

    # final state rule (viterbi.rs:90-93)
    idx_last = jnp.maximum(s_len - 1, 0)
    idx_prev = jnp.maximum(s_len - 2, 0)
    # one-hot sum is unsafe with -inf lanes; compare via max over masked rows
    v_last = jnp.max(jnp.where(s_idx == idx_last, last, neg))
    v_prev = jnp.max(jnp.where(s_idx == idx_prev, last, neg))
    final_s = jnp.where((s_len >= 2) & (v_prev > v_last), idx_prev, idx_last)

    # in-kernel backtrace (viterbi.rs:95-113 / viterbi.cu:161-181)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)

    def back_step(i, carry):
        s, path_row = carry
        t = t_pad - 1 - i
        path_row = jnp.where(t_iota == t, s, path_row)
        apply = (t >= 1) & (t < t_len)
        bp_row = bp_ref[pl.ds(jnp.maximum(t, 1), 1), :]
        step = jnp.sum(jnp.where(s_idx == s, bp_row, 0))
        s = jnp.where(apply, s - step, s)
        return s, path_row

    _, path_row = jax.lax.fori_loop(
        0, t_pad, back_step, (final_s, jnp.zeros((1, t_pad), jnp.int32))
    )
    path_ref[:] = path_row


def _make_blocked_kernel(
    bp_in_vmem: bool, gather_onehot: bool = False, batched: bool = False
):
    """Banded-Viterbi kernel factory.

    Emission rows always stream from HBM through a double-buffered VMEM
    window in 8-row blocks (TPU tiling requires 8-sublane-aligned slices;
    blocking amortizes DMA overhead). Backpointers live either in a VMEM
    scratch (fast path — one int32 per cell is the only VMEM cost) or in an
    HBM buffer written back block-by-block (long-form path, unbounded T·S —
    the analog of the reference CUDA kernel keeping bp in global memory,
    viterbi.cu:58-157). DP semantics identical to viterbi_ref (band,
    tie-breaking, final-state rule — viterbi.rs:50-156); equivalence tests
    assert bit-identical paths vs the numpy oracle.

    `gather_onehot`: instead of a pre-gathered [T, S] emission matrix, the
    kernel streams the RAW [T, v_pad] log-probs and expands each 8-row
    block to [8, S] on the MXU with a one-hot token matrix (exact: each
    output sums one x*1.0 against v_pad-1 zeros, precision=HIGHEST; vocab
    beyond 128 just contracts over ceil(V/128) lane chunks). This
    removes the [T, S] f32 emission array from HBM — at hour scale that
    array alone would not fit next to the backpointers (e.g. T=180k,
    S=13k: 9.4 GB each) — and halves the DP's HBM traffic.

    `batched`: grid-over-batch variant for batch mode. Mosaic cannot vmap
    a pallas_call whose HBM ("ANY") operands would need a per-batch index
    map (blocks in that space must be the full array), so the batch axis
    becomes the GRID dimension instead: HBM refs stay whole-array
    [B, ...] and the kernel indexes them with pl.program_id(0), while
    VMEM operands/outputs use ordinary per-b BlockSpecs. One program, B
    sequential grid steps — the per-utterance DP throughput of the
    single-utterance kernels, now available to submit_padded_batch for
    long-transcript buckets (the lax.scan fallback measured ~70x slower
    at these shapes).
    """

    def kernel(tlen_ref, slen_ref, emit_hbm, tokneq_ref, *rest):
        if gather_onehot:
            onehot_ref, path_ref, *rest = rest
        else:
            path_ref, *rest = rest
        if bp_in_vmem:
            bp_ref, emit_buf, sem_in = rest
        else:
            bp_hbm, emit_buf, bp_buf, sem_in, sem_out, sem_bt = rest
        if batched:
            # batched refs carry a leading singleton block axis (TPU block
            # shapes must keep the last two dims full/aligned, so the
            # per-b VMEM blocks are [1, 1, S] / [1, 1, T])
            b_idx = pl.program_id(0)
            emit_src = emit_hbm.at[b_idx]
            bp_dst = None if bp_in_vmem else bp_hbm.at[b_idx]
            t_len = tlen_ref[b_idx, 0]
            s_len = slen_ref[b_idx, 0]
            tokneq_row = tokneq_ref[0]
        else:
            emit_src = emit_hbm
            bp_dst = None if bp_in_vmem else bp_hbm
            t_len = tlen_ref[0, 0]
            s_len = slen_ref[0, 0]
            tokneq_row = tokneq_ref[0:1, :]
        t_pad = emit_src.shape[0]
        s_pad = onehot_ref.shape[-1] if gather_onehot else emit_src.shape[1]
        n_blocks = t_pad // 8
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
        neg = jnp.float32(-jnp.inf)

        def fetch_block(b, slot):
            return pltpu.make_async_copy(
                emit_src.at[pl.ds(pl.multiple_of(b * 8, 8), 8), :],
                emit_buf.at[slot],
                sem_in.at[slot],
            )

        if not bp_in_vmem:

            def store_block(b, slot):
                return pltpu.make_async_copy(
                    bp_buf.at[slot],
                    bp_dst.at[pl.ds(pl.multiple_of(b * 8, 8), 8), :],
                    sem_out.at[slot],
                )

        fetch_block(0, 0).start()

        final_floor = jnp.maximum(s_len - 2, 0)
        tokneq = tokneq_row != 0
        neg_row = jnp.full((1, s_pad), neg, jnp.float32)

        def shift(row, k):
            return jnp.where(s_idx >= k, _roll(row, k), neg)

        def dp_step(t, prev, emit):
            remaining = t_len - 1 - t
            curr_start = jnp.maximum(final_floor - 2 * remaining, 0)
            curr_end = jnp.minimum(2 * t + 1, s_len - 1)
            cand1 = shift(prev, 1)
            cand2 = jnp.where(tokneq, shift(prev, 2), neg)
            best = prev
            step = jnp.zeros((1, s_pad), jnp.int32)
            m1 = cand1 > best
            best = jnp.where(m1, cand1, best)
            step = jnp.where(m1, 1, step)
            m2 = cand2 > best
            best = jnp.where(m2, cand2, best)
            step = jnp.where(m2, 2, step)
            in_band = (s_idx >= curr_start) & (s_idx <= curr_end)
            curr = jnp.where(in_band, best + emit, neg)
            bp_row = jnp.where(in_band, step, 0)
            # t == 0 is the init row (no transition), t >= t_len is padding
            active = (t >= 1) & (t < t_len)
            return jnp.where(active, curr, prev), jnp.where(active, bp_row, 0)

        def fwd_block(b, prev):
            slot = b % 2
            fetch_block(b, slot).wait()

            @pl.when(b + 1 < n_blocks)
            def _():
                fetch_block(b + 1, (b + 1) % 2).start()

            if not bp_in_vmem:
                # write-back ping-pong: before reusing this slot's staging
                # buffer, wait for the copy issued two blocks ago — the
                # store itself overlaps the NEXT block's DP instead of
                # stalling the core every 8 rows
                @pl.when(b >= 2)
                def _():
                    store_block(b - 2, slot).wait()

            if gather_onehot:
                # [8, V] @ one-hot [V, S] -> [8, S]: exact gather on the MXU
                onehot = onehot_ref[0] if batched else onehot_ref[:]
                emit_blk = jax.lax.dot_general(
                    emit_buf[slot], onehot,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            for i in range(8):  # static unroll within the block
                t = b * 8 + i
                emit = (
                    emit_blk[i : i + 1, :] if gather_onehot
                    else emit_buf[slot, i : i + 1, :]
                )
                if i == 0:
                    # fold the DP init (viterbi.rs:62-65) into block 0 row 0
                    init_row = jnp.where(s_idx == 0, emit, neg)
                    init_row = jnp.where(
                        (s_idx == 1) & (s_len > 1), emit, init_row
                    )
                    prev = jnp.where(b == 0, init_row, prev)
                prev, bp_row = dp_step(t, prev, emit)
                if bp_in_vmem:
                    bp_ref[pl.ds(t, 1), :] = bp_row
                else:
                    bp_buf[slot, i : i + 1, :] = bp_row

            if not bp_in_vmem:
                store_block(b, slot).start()

            return prev

        last = jax.lax.fori_loop(0, n_blocks, fwd_block, neg_row)

        if not bp_in_vmem:
            # drain the outstanding write-backs before the backtrace reads
            # bp_hbm (n_blocks is static)
            if n_blocks >= 2:
                store_block(n_blocks - 2, (n_blocks - 2) % 2).wait()
            store_block(n_blocks - 1, (n_blocks - 1) % 2).wait()

        # final state rule (viterbi.rs:90-93); one-hot max avoids a dynamic
        # lane extract (no scalar dynamic vector indexing on TPU)
        idx_last = jnp.maximum(s_len - 1, 0)
        idx_prev = jnp.maximum(s_len - 2, 0)
        v_last = jnp.max(jnp.where(s_idx == idx_last, last, neg))
        v_prev = jnp.max(jnp.where(s_idx == idx_prev, last, neg))
        final_s = jnp.where((s_len >= 2) & (v_prev > v_last), idx_prev, idx_last)

        t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)

        if bp_in_vmem:

            def back_step(i, carry):
                s, path_row = carry
                t = t_pad - 1 - i
                path_row = jnp.where(t_iota == t, s, path_row)
                apply = (t >= 1) & (t < t_len)
                bp_row = bp_ref[pl.ds(jnp.maximum(t, 1), 1), :]
                step = jnp.sum(jnp.where(s_idx == s, bp_row, 0))
                s = jnp.where(apply, s - step, s)
                return s, path_row

            _, path_row = jax.lax.fori_loop(
                0, t_pad, back_step,
                (final_s, jnp.zeros((1, t_pad), jnp.int32)),
            )
        else:

            def back_block(rb, carry):
                s, path_row = carry
                b = n_blocks - 1 - rb
                bt_cp = pltpu.make_async_copy(
                    bp_dst.at[pl.ds(pl.multiple_of(b * 8, 8), 8), :],
                    bp_buf.at[1],
                    sem_bt,
                )
                bt_cp.start()
                bt_cp.wait()
                for i in range(7, -1, -1):  # static unroll
                    t = b * 8 + i
                    path_row = jnp.where(t_iota == t, s, path_row)
                    apply = (t >= 1) & (t < t_len)
                    step = jnp.sum(
                        jnp.where(s_idx == s, bp_buf[1, i : i + 1, :], 0)
                    )
                    s = jnp.where(apply, s - step, s)
                return s, path_row

            _, path_row = jax.lax.fori_loop(
                0, n_blocks, back_block,
                (final_s, jnp.zeros((1, t_pad), jnp.int32)),
            )

        # batched blocks are [1, 1, T]: store full-ref (a sliced VMEM store
        # would need 128-aligned slices under Mosaic's tiling)
        path_ref[:] = path_row[None] if batched else path_row

    return kernel


_KERNEL_BP_VMEM = _make_blocked_kernel(bp_in_vmem=True)
_KERNEL_BP_HBM = _make_blocked_kernel(bp_in_vmem=False)
_KERNEL_BP_HBM_GATHER = _make_blocked_kernel(bp_in_vmem=False, gather_onehot=True)
_KERNEL_BP_VMEM_BATCH = _make_blocked_kernel(bp_in_vmem=True, batched=True)
_KERNEL_BP_HBM_BATCH = _make_blocked_kernel(bp_in_vmem=False, batched=True)
_KERNEL_BP_HBM_GATHER_BATCH = _make_blocked_kernel(
    bp_in_vmem=False, gather_onehot=True, batched=True
)


def _prepare_inputs(log_probs, tokens):
    t_orig = log_probs.shape[0]
    t_pad = _round_up(max(t_orig, 8), 8)
    s_pad = _round_up(max(int(tokens.shape[0]), LANE), LANE)
    tokens_p = jnp.pad(tokens.astype(jnp.int32), (0, s_pad - tokens.shape[0]))
    emit = jnp.take(log_probs.astype(jnp.float32), tokens_p, axis=1)
    if t_pad != t_orig:
        emit = jnp.pad(emit, ((0, t_pad - t_orig), (0, 0)))
    tokneq = (tokens_p != jnp.roll(tokens_p, 2)).astype(jnp.int32)[None, :]
    return emit, tokneq, t_orig, t_pad, s_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas_single(
    log_probs: jnp.ndarray,
    tokens: jnp.ndarray,
    t_len: jnp.ndarray,
    s_len: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-utterance fused Viterbi. Same contract as
    viterbi_ref.viterbi_single: returns path int32 aligned to the input T
    (frames >= t_len hold the final state). vmap over the leading axis for
    batches.

    Tiered by (static) shape: when emissions + backpointers both fit VMEM
    the fully-resident kernel runs (no DMA chain — fastest); otherwise
    emissions stream from HBM with bp still in VMEM."""
    emit, tokneq, t_orig, t_pad, s_pad = _prepare_inputs(log_probs, tokens)
    scalars = (
        jnp.reshape(jnp.asarray(t_len, jnp.int32), (1, 1)),
        jnp.reshape(jnp.asarray(s_len, jnp.int32), (1, 1)),
    )

    if 8 * t_pad * s_pad <= VMEM_BUDGET_BYTES:
        path = pl.pallas_call(
            _viterbi_kernel_resident,
            out_shape=jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((t_pad, s_pad), jnp.int32)],
            interpret=interpret,
        )(*scalars, emit, tokneq)
        return path[0][:t_orig]

    if 4 * t_pad * s_pad > VMEM_BUDGET_BYTES:
        # beyond the VMEM backpointer budget (fits_vmem): delegate to the
        # HBM-backpointer tier instead of crashing with an opaque Mosaic
        # VMEM allocation error — reachable via force_backend="pallas"
        return viterbi_pallas_single_hbm(
            log_probs, tokens, t_len, s_len, interpret=interpret
        )

    path = pl.pallas_call(
        _KERNEL_BP_VMEM,
        out_shape=jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_pad, s_pad), jnp.int32),   # backpointers
            pltpu.VMEM((2, 8, s_pad), jnp.float32),  # emission window
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*scalars, emit, tokneq)
    return path[0][:t_orig]


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas_batch(log_probs, tokens, t_lens, s_lens, interpret=False):
    """Batched fused Viterbi: [B, T, V], [B, S], [B], [B] → paths [B, T].

    Tier dispatch by static padded shape:
    - fully-VMEM-resident kernel under vmap (no HBM operands — vmappable);
    - otherwise a GRID-over-batch kernel (Mosaic rejects vmap over HBM
      operands: "ANY"-space blocks must be whole-array) with backpointers
      in VMEM scratch when they fit, else streamed through HBM — so batch
      mode keeps full DP throughput at 30 s-audio / long-transcript shapes
      instead of falling back to the ~70x-slower lax.scan DP
      (the reference's GPU DP is likewise unconditional above its
      threshold, viterbi.rs:13-47)."""
    b, t_orig, v = log_probs.shape
    t_pad = _round_up(max(t_orig, 8), 8)
    s_pad = _round_up(max(int(tokens.shape[1]), LANE), LANE)

    if 8 * t_pad * s_pad <= VMEM_BUDGET_BYTES:
        # emissions + backpointers both VMEM-resident: vmappable
        fn = functools.partial(viterbi_pallas_single, interpret=interpret)
        return jax.vmap(fn)(log_probs, tokens, t_lens, s_lens)

    bp_in_vmem = 4 * t_pad * s_pad <= VMEM_BUDGET_BYTES
    gather = (not bp_in_vmem) and _use_onehot_gather(v, int(tokens.shape[1]))
    v_pad = _round_up(max(v, LANE), LANE)

    tokens_p = jnp.pad(
        tokens.astype(jnp.int32), ((0, 0), (0, s_pad - tokens.shape[1]))
    )
    # per-b VMEM operands/outputs carry a singleton middle axis so their
    # block shapes keep the last two dims equal to the array dims (the TPU
    # (8, 128)-alignment rule for blocked specs)
    tokneq = (tokens_p != jnp.roll(tokens_p, 2, axis=1)).astype(jnp.int32)
    tokneq = tokneq[:, None, :]  # [B, 1, s_pad]
    scalars = (
        jnp.reshape(jnp.asarray(t_lens, jnp.int32), (b, 1)),
        jnp.reshape(jnp.asarray(s_lens, jnp.int32), (b, 1)),
    )
    grid_kw = dict(
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, t_pad), jnp.int32),
        out_specs=pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tokneq_spec = pl.BlockSpec((1, 1, s_pad), lambda i: (i, 0, 0))

    if gather:
        lp = log_probs.astype(jnp.float32)
        lp = jnp.pad(lp, ((0, 0), (0, t_pad - t_orig), (0, v_pad - v)))
        onehot = (
            tokens_p[:, None, :]
            == jnp.arange(v_pad, dtype=jnp.int32)[None, :, None]
        ).astype(jnp.float32)  # [B, v_pad, s_pad]
        path, _ = pl.pallas_call(
            _KERNEL_BP_HBM_GATHER_BATCH,
            in_specs=[
                smem, smem, hbm, tokneq_spec,
                pl.BlockSpec((1, v_pad, s_pad), lambda i: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 8, v_pad), jnp.float32),
                pltpu.VMEM((2, 8, s_pad), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            **{**grid_kw, "out_shape": (
                grid_kw["out_shape"],
                jax.ShapeDtypeStruct((b, t_pad, s_pad), jnp.int32),
            ), "out_specs": (grid_kw["out_specs"], hbm)},
        )(*scalars, lp, tokneq, onehot)
        return path[:, 0, :t_orig]

    # pre-gathered [B, T, S] emissions (vocab > 128 or bp fits VMEM)
    emit = jnp.take_along_axis(
        log_probs.astype(jnp.float32),
        jnp.broadcast_to(tokens_p[:, None, :], (b, t_orig, s_pad)),
        axis=2,
    )
    if t_pad != t_orig:
        emit = jnp.pad(emit, ((0, 0), (0, t_pad - t_orig), (0, 0)))

    if bp_in_vmem:
        path = pl.pallas_call(
            _KERNEL_BP_VMEM_BATCH,
            in_specs=[smem, smem, hbm, tokneq_spec],
            scratch_shapes=[
                pltpu.VMEM((t_pad, s_pad), jnp.int32),
                pltpu.VMEM((2, 8, s_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **grid_kw,
        )(*scalars, emit, tokneq)
        return path[:, 0, :t_orig]

    path, _ = pl.pallas_call(
        _KERNEL_BP_HBM_BATCH,
        in_specs=[smem, smem, hbm, tokneq_spec],
        scratch_shapes=[
            pltpu.VMEM((2, 8, s_pad), jnp.float32),
            pltpu.VMEM((2, 8, s_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        **{**grid_kw, "out_shape": (
            grid_kw["out_shape"],
            jax.ShapeDtypeStruct((b, t_pad, s_pad), jnp.int32),
        ), "out_specs": (grid_kw["out_specs"], hbm)},
    )(*scalars, emit, tokneq)
    return path[:, 0, :t_orig]


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas_single_hbm(
    log_probs: jnp.ndarray,
    tokens: jnp.ndarray,
    t_len: jnp.ndarray,
    s_len: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """HBM-resident-backpointer variant for T·S beyond VMEM (long-form).

    When the in-kernel gather pays for itself (see `_use_onehot_gather` —
    char-level vocabs always, phoneme-CTC vocabs in the 100s via lane-chunk
    tiling of the one-hot), emissions are gathered IN-KERNEL from the raw
    [T, V] log-probs via a one-hot MXU dot, so HBM holds only the int32
    backpointers — without this, hour-scale audio cannot fit ([T, S] f32
    emissions + int32 bp at T=180k, S=13k are ~9.4 GB EACH against 16 GB of
    HBM), and the DP's HBM traffic halves."""
    if _use_onehot_gather(log_probs.shape[1], int(tokens.shape[0])):
        return _viterbi_hbm_gather(log_probs, tokens, t_len, s_len, interpret)
    emit, tokneq, t_orig, t_pad, s_pad = _prepare_inputs(log_probs, tokens)

    path, _ = pl.pallas_call(
        _KERNEL_BP_HBM,
        out_shape=(
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, s_pad), jnp.int32),  # bp (HBM scratch)
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, s_pad), jnp.float32),
            pltpu.VMEM((2, 8, s_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # wide-S long-form (S in the 10 000s): the double-buffered
            # emission/bp blocks + path row + DP score rows exceed the
            # default 16 MB scoped budget (measured 17.83 MB at T=180 000,
            # S=12 672); v5e has 128 MB physical VMEM
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(t_len, jnp.int32), (1, 1)),
        jnp.reshape(jnp.asarray(s_len, jnp.int32), (1, 1)),
        emit,
        tokneq,
    )
    return path[0][:t_orig]


def _viterbi_hbm_gather(log_probs, tokens, t_len, s_len, interpret):
    t_orig = log_probs.shape[0]
    v = log_probs.shape[1]
    v_pad = _round_up(max(v, LANE), LANE)
    t_pad = _round_up(max(t_orig, 8), 8)
    s_pad = _round_up(max(int(tokens.shape[0]), LANE), LANE)
    tokens_p = jnp.pad(tokens.astype(jnp.int32), (0, s_pad - tokens.shape[0]))
    lp = log_probs.astype(jnp.float32)
    lp = jnp.pad(lp, ((0, t_pad - t_orig), (0, v_pad - v)))
    # vocab > 128 tiles naturally: the [8, v_pad] @ [v_pad, s_pad] MXU dot
    # contracts ceil(V/128) lane chunks; each output cell still sums exactly
    # one x*1.0 against zeros, so the gather stays bit-exact
    onehot = (
        tokens_p[None, :] == jnp.arange(v_pad, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)  # [v_pad, s_pad]
    tokneq = (tokens_p != jnp.roll(tokens_p, 2)).astype(jnp.int32)[None, :]

    path, _ = pl.pallas_call(
        _KERNEL_BP_HBM_GATHER,
        out_shape=(
            jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, s_pad), jnp.int32),  # bp (HBM scratch)
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # raw log-probs [T, v_pad]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokneq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # one-hot token matrix
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, v_pad), jnp.float32),  # raw log-prob window
            pltpu.VMEM((2, 8, s_pad), jnp.int32),    # bp block buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # hour-scale shapes: one-hot matrix + the [1, T] path/backtrace
            # rows exceed the default 16 MB scoped budget slightly
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(t_len, jnp.int32), (1, 1)),
        jnp.reshape(jnp.asarray(s_len, jnp.int32), (1, 1)),
        lp,
        tokneq,
        onehot,
    )
    return path[0][:t_orig]


VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # leave headroom below the ~16 MB VMEM

# The one-hot token matrix of the in-kernel gather tier lives in VMEM for
# the whole kernel (reused by every 8-row block); cap it well below the
# 64 MB scoped limit the gather kernels request so the block buffers +
# path rows + DP score rows always fit beside it (they total ~4 MB at the
# hour × phoneme shape). 40 MB admits S ≈ 20 000 at v_pad = 512 — covers
# 1 h of phoneme-CTC audio (S = 12 672 → one-hot 25.9 MB), the shape the
# gather tier exists for: its pre-gathered alternative needs [T, S] f32
# emissions + int32 backpointers ≈ 9.1 GB EACH there, which cannot fit
# 16 GB of HBM at all (measured: reports/longform_phoneme_60min.json).
ONEHOT_VMEM_BUDGET_BYTES = 40 * 1024 * 1024


def _use_onehot_gather(v: int, s_len: int) -> bool:
    """Dispatch rule for the in-kernel one-hot emission gather (HBM tiers).

    Traffic accounting: the gather tier reads [T, v_pad] raw log-probs once;
    the pre-gathered tier writes + reads a [T, s_pad] f32 emission matrix
    (XLA gather output, then kernel stream) — so the gather wins HBM traffic
    whenever v_pad < 2·s_pad. vocab > 128 (phoneme CTC: 100s of symbols,
    e.g. V≈392) tiles the one-hot contraction over ceil(V/128) lane chunks
    on the MXU — bit-exact, each output still sums exactly one x·1.0.
    The only hard cap is the one-hot matrix [v_pad, s_pad] f32 staying
    within its VMEM budget."""
    v_pad = _round_up(max(v, LANE), LANE)
    s_pad = _round_up(max(s_len, LANE), LANE)
    return (
        v_pad < 2 * s_pad
        and 4 * v_pad * s_pad <= ONEHOT_VMEM_BUDGET_BYTES
    )


def fits_vmem(t_len: int, s_len: int) -> bool:
    """The fast kernel keeps only the int32 backpointers in VMEM (emissions
    stream from HBM): 4 bytes per (t, s) cell after lane padding. Beyond
    this, the HBM-backpointer variant takes over (unbounded T·S)."""
    s_pad = _round_up(max(s_len, LANE), LANE)
    return 4 * t_len * s_pad <= VMEM_BUDGET_BYTES


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def viterbi_pallas_host(log_probs: np.ndarray, tokens: np.ndarray) -> list[tuple[int, int]]:
    """Host convenience wrapper mirroring viterbi_ref.viterbi_jnp_host
    (used by equivalence tests; interpret mode off-TPU)."""
    t_len = int(log_probs.shape[0])
    s_len = int(len(tokens))
    if t_len == 0 or s_len == 0:
        return []
    path = viterbi_pallas_single(
        jnp.asarray(log_probs, jnp.float32),
        jnp.asarray(tokens, jnp.int32),
        jnp.int32(t_len),
        jnp.int32(s_len),
        interpret=not on_tpu(),
    )
    states = np.asarray(path)
    return [(int(s), t) for t, s in enumerate(states[:t_len])]
