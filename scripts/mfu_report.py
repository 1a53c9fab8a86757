"""MFU / roofline accounting per model family + DP-kernel bytes roofline.

Answers "is it ACTUALLY fast?" in hardware terms rather than real-time
multiples (VERDICT r3 item 4; the reference's per-stage perf accounting
analog is BENCHMARKS.md:349-364 scaling methodology):

1. **Model MFU** — per family, FLOPs of the jitted forward + log-softmax
   graph at the standard bench shape are counted by walking the jaxpr
   (dot_general = 2·M·N·K, conv = 2·out·K·Cin/groups, scan bodies
   multiplied by trip count — XLA's own cost_analysis counts a scanned
   encoder layer ONCE, undercounting a 12-layer stack ~8x; abstract
   params, nothing materialized), divided by the MEASURED ms/batch from a
   bench_models JSONL (whole-pipeline, forward-dominated — so reported MFU
   is a slight underestimate). HBM bytes use a perfect-fusion traffic
   model: operands + outputs of every dot/conv (weights re-read per scan
   step), elementwise ops assumed fused. Both rooflines are evaluated:
   achieved-TFLOP/s vs chip peak and achieved-GB/s vs HBM peak; the
   binding constraint is whichever fraction is higher, cross-checked
   against the graph's arithmetic intensity vs the machine balance.

2. **DP-kernel roofline** (`--dp`, runs on the device) — measures the
   fused Viterbi kernel tiers at representative shapes and compares
   analytic bytes moved per tier against the HBM peak:
     resident    : emissions [T,S]f32 in (+ path out)
     bp-VMEM     : emissions [T,S]f32 streamed in
     bp-HBM      : emissions in + backpointers [T,S]i32 out + in (backtrace)
     bp-HBM+gather: raw [T,v_pad]f32 in + backpointers out + in

Usage:
    python scripts/mfu_report.py --jsonl reports/family_throughput_r4.jsonl
    python scripts/mfu_report.py --dp            # device DP measurement
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

# chip peaks: (dense bf16 TFLOP/s, HBM GB/s) per chip. device_kind substring
# match, overridable with --peak-tflops/--peak-gbps.
PEAKS = {
    "v5 lite": (197.0, 819.0),   # v5e
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6 lite": (918.0, 1640.0),  # trillium
    "v6e": (918.0, 1640.0),
    "v3": (123.0, 900.0),
    "v2": (46.0, 700.0),
}


def chip_peaks(device_kind: str) -> tuple[float, float]:
    dk = device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in dk:
            return peaks
    raise SystemExit(
        f"unknown device kind {device_kind!r}: pass --peak-tflops/--peak-gbps"
    )


def _aval_bytes(aval) -> int:
    return int(np.prod(aval.shape)) * aval.dtype.itemsize


def jaxpr_cost(jaxpr) -> tuple[float, float]:
    """(flops, bytes) of a jaxpr: 2/MAC for dot_general + conv, scan bodies
    multiplied by trip count, control-flow sub-jaxprs recursed. Bytes model:
    operands + outputs of every dot/conv (perfect elementwise fusion)."""
    flops = 0.0
    bytes_ = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            lhs, rhs = (v.aval for v in eqn.invars)
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            batch = int(np.prod([lhs.shape[i] for i in lb])) if lb else 1
            k = int(np.prod([lhs.shape[i] for i in lc])) if lc else 1
            m = int(np.prod(lhs.shape)) // (batch * k)
            n = int(np.prod(rhs.shape)) // (batch * k)
            flops += 2.0 * batch * m * n * k
            bytes_ += _aval_bytes(lhs) + _aval_bytes(rhs)
            bytes_ += _aval_bytes(eqn.outvars[0].aval)
        elif prim == "conv_general_dilated":
            lhs, rhs = (v.aval for v in eqn.invars)
            out = eqn.outvars[0].aval
            # per output element: K_spatial * C_in_per_group MACs — the HLO
            # kernel's input-feature dim is already divided by
            # feature_group_count, so no explicit groups term is needed
            dn = eqn.params["dimension_numbers"]
            k_spatial = int(np.prod([rhs.shape[i] for i in dn.rhs_spec[2:]]))
            c_in = rhs.shape[dn.rhs_spec[1]]
            flops += 2.0 * int(np.prod(out.shape)) * k_spatial * c_in
            bytes_ += _aval_bytes(lhs) + _aval_bytes(rhs) + _aval_bytes(out)
        elif prim == "scan":
            inner_f, inner_b = jaxpr_cost(eqn.params["jaxpr"].jaxpr)
            length = int(eqn.params["length"])
            flops += inner_f * length
            bytes_ += inner_b * length
        elif prim == "while":
            # trip count unknown; count the body once (none of the forward
            # graphs use while loops for heavy compute)
            for key in ("body_jaxpr", "cond_jaxpr"):
                f, b = jaxpr_cost(eqn.params[key].jaxpr)
                flops += f
                bytes_ += b
        elif prim == "cond":
            branches = [jaxpr_cost(br.jaxpr) for br in eqn.params["branches"]]
            f, b = max(branches)
            flops += f
            bytes_ += b
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    f, b = jaxpr_cost(getattr(sub, "jaxpr", sub))
                    flops += f
                    bytes_ += b
                    break
    return flops, bytes_


def family_cost(name: str, batch: int, audio_sec: float) -> dict:
    """Analytic FLOPs + traffic-model bytes of forward+log_softmax (jaxpr
    walk with abstract params — see module docstring for why XLA's own
    cost_analysis cannot be used: scan bodies are counted once)."""
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.models.ctc_model import (
        _freeze_cfg,
        log_softmax_logits,
        wav2vec2_forward,
    )
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import PRESETS

    cfg = _freeze_cfg(PRESETS[name](vocab_size=32))
    n = int(audio_sec * 16000)
    params_shape = jax.eval_shape(
        lambda k: init_params(cfg, k), jax.random.PRNGKey(0)
    )
    audio = jax.ShapeDtypeStruct((batch, n), jnp.float32)
    lens = jax.ShapeDtypeStruct((batch,), jnp.int32)

    def fn(params, audio, lens):
        logits = wav2vec2_forward(
            params, audio, cfg, audio_lens=lens, compute_dtype=jnp.bfloat16
        )
        return log_softmax_logits(logits)

    jaxpr = jax.make_jaxpr(fn)(params_shape, audio, lens)
    flops, bytes_ = jaxpr_cost(jaxpr.jaxpr)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params_shape)
    )
    return {
        "flops": flops,
        "bytes": bytes_,
        "params_m": round(n_params / 1e6, 1),
    }


def model_mfu(args) -> int:
    measured: dict[str, dict] = {}
    for line in Path(args.jsonl).read_text().splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        if rec.get("metric") == "model_family_throughput":
            measured[rec["model"]] = rec  # last record wins

    peak_tflops, peak_gbps = (args.peak_tflops, args.peak_gbps)
    if not (peak_tflops and peak_gbps):
        import jax

        kind = jax.devices()[0].device_kind
        peak_tflops, peak_gbps = chip_peaks(kind)
        print(f"# device: {kind} — peak {peak_tflops} TFLOP/s bf16, "
              f"{peak_gbps} GB/s HBM", file=sys.stderr)
    balance = peak_tflops * 1e12 / (peak_gbps * 1e9)  # FLOP per byte

    rows = []
    for name, rec in measured.items():
        cost = family_cost(name, rec["batch"], rec["audio_seconds_per_utt"])
        s = rec["ms_per_batch"] / 1e3
        tflops = cost["flops"] / s / 1e12
        gbps = cost["bytes"] / s / 1e9
        mfu = tflops / peak_tflops
        hbm = gbps / peak_gbps
        intensity = cost["flops"] / cost["bytes"]
        bound = "compute" if intensity > balance else "bandwidth"
        if max(mfu, hbm) < 0.25:
            # neither roofline is near: the family is limited by dispatch /
            # fusion-serialized epilogues (BENCHMARKS.md "remaining gap"),
            # not by the chip's FLOPs or HBM
            bound = f"overhead ({bound}-leaning)"
        rows.append({
            "family": name,
            "params_m": cost["params_m"],
            "batch": rec["batch"],
            "ms_per_batch": rec["ms_per_batch"],
            "realtime_factor": rec.get("realtime_factor"),
            "gflops_per_batch": round(cost["flops"] / 1e9, 1),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct": round(100 * mfu, 1),
            "achieved_gbps": round(gbps, 1),
            "hbm_roofline_pct": round(100 * hbm, 1),
            "arithmetic_intensity": round(intensity, 1),
            "bound": bound,
        })
        print(f"[mfu] {name}: {rows[-1]['achieved_tflops']} TFLOP/s "
              f"({rows[-1]['mfu_pct']}% MFU), {rows[-1]['achieved_gbps']} "
              f"GB/s ({rows[-1]['hbm_roofline_pct']}% HBM), {bound}-bound",
              file=sys.stderr, flush=True)

    out = {
        "metric": "mfu_report",
        "peak_tflops_bf16": peak_tflops,
        "peak_hbm_gbps": peak_gbps,
        "machine_balance_flop_per_byte": round(balance, 1),
        "note": "ms_per_batch is the whole double-buffered pipeline "
                "(forward-dominated), so MFU slightly underestimates the "
                "forward graph itself; flops/bytes from XLA cost analysis",
        "families": rows,
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)

    print("| family | params | ms/batch | TFLOP/s | MFU % | GB/s | HBM % "
          "| bound |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['family']} | {r['params_m']}M | {r['ms_per_batch']} "
              f"| {r['achieved_tflops']} | {r['mfu_pct']} "
              f"| {r['achieved_gbps']} | {r['hbm_roofline_pct']} "
              f"| {r['bound']} |")
    return 0


def dp_roofline(args) -> int:
    """Measure the fused-Viterbi tiers and report bytes-moved rooflines."""
    import jax
    import jax.numpy as jnp

    import wav2vec2_tpu.ops.viterbi_pallas as vp

    peak_tflops, peak_gbps = (args.peak_tflops, args.peak_gbps)
    if not (peak_tflops and peak_gbps):
        kind = jax.devices()[0].device_kind
        peak_tflops, peak_gbps = chip_peaks(kind)

    # (label, T, S, V) — each chosen to land in the tier its label names
    # (dispatch re-derived below and asserted): 30 s char CTC, 2 min char,
    # hour-scale char + phoneme gather tiers, and a wide-vocab short-
    # transcript shape that pre-gathers (v_pad >= 2*s_pad)
    shapes = [
        ("resident_30s_char", "resident", 1500, 301, 32),
        ("bp_vmem_2min_char", "bp_vmem", 6000, 301, 32),
        ("bp_hbm_gather_1h_char", "bp_hbm_gather", 180000, 13001, 32),
        ("bp_hbm_gather_1h_phoneme", "bp_hbm_gather", 180000, 6001, 392),
        ("pregathered_wide_vocab_short", "bp_hbm", 60000, 250, 392),
    ]
    if args.quick:
        shapes = shapes[:2]

    rows = []
    rng = np.random.default_rng(0)
    for label, want_tier, t_len, s_len, v in shapes:
        s_pad = -(-max(s_len, 128) // 128) * 128
        v_pad = -(-max(v, 128) // 128) * 128
        t_pad = -(-max(t_len, 8) // 8) * 8
        gather = vp._use_onehot_gather(v, s_len)
        if 4 * t_pad * s_pad <= vp.VMEM_BUDGET_BYTES:
            if 8 * t_pad * s_pad <= vp.VMEM_BUDGET_BYTES:
                tier, bytes_moved = "resident", 4 * t_pad * s_pad
            else:
                tier, bytes_moved = "bp_vmem", 4 * t_pad * s_pad
            fn = vp.viterbi_pallas_single
        elif gather:
            tier = "bp_hbm_gather"
            bytes_moved = 4 * t_pad * v_pad + 2 * 4 * t_pad * s_pad
            fn = vp.viterbi_pallas_single_hbm
        else:
            tier = "bp_hbm"
            bytes_moved = 3 * 4 * t_pad * s_pad
            fn = vp.viterbi_pallas_single_hbm

        assert tier == want_tier, f"{label}: dispatch landed in {tier}"
        lp = rng.normal(size=(t_len, v)).astype(np.float32)
        tokens = rng.integers(0, v, size=s_len).astype(np.int32)
        dev = (jnp.asarray(lp), jnp.asarray(tokens),
               jnp.int32(t_len), jnp.int32(s_len))
        jax.block_until_ready(dev)
        path = fn(*dev)            # compile + warm
        np.asarray(path)           # force fetch through the tunnel
        reps = args.repeats
        t0 = time.perf_counter()
        for _ in range(reps):
            path = fn(*dev)
        np.asarray(path)
        dt = (time.perf_counter() - t0) / reps
        gbps = bytes_moved / dt / 1e9
        rows.append({
            "label": label, "tier": tier, "t": t_len, "s": s_len, "v": v,
            "cells_g": round(t_len * s_len / 1e9, 2),
            "bytes_moved_mb": round(bytes_moved / 1e6, 1),
            "ms": round(dt * 1e3, 1),
            "achieved_gbps": round(gbps, 1),
            "hbm_roofline_pct": round(100 * gbps / peak_gbps, 1),
        })
        print(f"[dp] {label}: tier={tier} {rows[-1]['ms']} ms, "
              f"{rows[-1]['achieved_gbps']} GB/s "
              f"({rows[-1]['hbm_roofline_pct']}% of HBM peak)",
              file=sys.stderr, flush=True)

    out = {"metric": "dp_roofline", "peak_hbm_gbps": peak_gbps,
           "shapes": rows}
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--jsonl", default="reports/family_throughput_r3b.jsonl",
                   help="bench_models --emit-json artifact with measured "
                        "ms_per_batch per family")
    p.add_argument("--dp", action="store_true",
                   help="measure DP-kernel tiers on the device instead")
    p.add_argument("--quick", action="store_true",
                   help="--dp: only the two small shapes")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=None)
    p.add_argument("--peak-tflops", type=float, default=None)
    p.add_argument("--peak-gbps", type=float, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (cost analysis is "
                        "backend-independent; peaks must be given)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.out is None:
        args.out = "reports/dp_roofline.json" if args.dp else "reports/mfu.json"
    return dp_roofline(args) if args.dp else model_mfu(args)


if __name__ == "__main__":
    raise SystemExit(main())
