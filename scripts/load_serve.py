"""Load benchmark for the HTTP serving daemon (wav2vec2_tpu/serve.py).

Starts the daemon in-process against a full-size wav2vec2-base model
(random weights — compute is identical to real ones), fires concurrent
/align requests from a thread pool, and reports throughput + latency
percentiles + the daemon's own batch-size histogram.

Usage:
    python scripts/load_serve.py [--clients 32] [--requests 256]
        [--duration 10] [--window-ms 25] [--max-batch 64]
        [--warmup-seconds 10] [--format words]

Prints one JSON line with the results.
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import tempfile
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
for _p in (str(REPO_ROOT), str(REPO_ROOT / "scripts")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from soak_cli import make_model_dir  # noqa: E402  (sibling script)

TRANSCRIPT = ("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG WHILE SINGING "
              "ANCIENT MELODIES UNDER BRIGHT WINTER STARS")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--duration", type=float, default=10.0,
                   help="seconds of audio per request")
    p.add_argument("--window-ms", type=float, default=25.0)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--warmup-seconds", default="10",
                   help="comma-separated durations to pre-compile ('' = none)")
    p.add_argument("--format", default="words", choices=["words", "srt", "vtt"])
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    from wav2vec2_tpu import serve as S
    from wav2vec2_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    root = Path(tempfile.mkdtemp(prefix="load_serve_"))
    import atexit
    import shutil

    atexit.register(shutil.rmtree, root, True)  # ~380 MB checkpoint in /tmp
    model_dir = make_model_dir(root)
    service, device = S.build_service_from_model_dir(
        model_dir, compute_dtype=args.compute_dtype,
        window_ms=args.window_ms, max_batch=args.max_batch,
    )
    if args.warmup_seconds.strip():
        durs = [float(d) for d in args.warmup_seconds.split(",") if d.strip()]
        t0 = time.perf_counter()
        n = S.warmup_aligner(service.aligner, durs, max_batch=args.max_batch)
        print(f"[load] warmed {n} shapes in {time.perf_counter() - t0:.0f} s",
              file=sys.stderr, flush=True)

    httpd = S.AlignHTTPServer(("127.0.0.1", 0), S.make_handler(service, device))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"

    rng = np.random.default_rng(0)
    n = int(args.duration * 16000)
    pcm = (np.clip(rng.normal(0, 0.1, n), -1, 1) * 32767).astype("<i2")
    payload = json.dumps({
        "audio": {"pcm16": base64.b64encode(pcm.tobytes()).decode()},
        "sample_rate_hz": 16000,
        "transcript": TRANSCRIPT,
        "format": args.format,
    }).encode()

    latencies: list[float] = []
    lat_lock = threading.Lock()
    errors: list[str] = []

    def one(_i):
        req = urllib.request.Request(
            url + "/align", data=payload,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
        except Exception as e:
            body = ""
            if hasattr(e, "read"):
                try:
                    body = e.read().decode()[:200]
                except Exception:
                    pass
            with lat_lock:
                errors.append(f"{type(e).__name__}: {e} {body}")
            return
        with lat_lock:
            latencies.append(time.perf_counter() - t0)

    t_start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        list(pool.map(one, range(args.requests)))
    wall = time.perf_counter() - t_start

    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    httpd.shutdown()
    service.close()

    lat = np.sort(np.array(latencies))
    q = lambda p_: float(lat[min(len(lat) - 1, int(p_ * len(lat)))]) if len(lat) else None
    print(json.dumps({
        "metric": "serve_load",
        "requests_ok": len(latencies),
        "errors": len(errors),
        "first_error": errors[0] if errors else None,
        "clients": args.clients,
        "audio_seconds_per_request": args.duration,
        "wall_seconds": round(wall, 2),
        "requests_per_second": round(len(latencies) / wall, 2),
        "realtime_factor": round(len(latencies) * args.duration / wall, 1),
        "latency_p50_ms": round(q(0.50) * 1000, 1) if lat.size else None,
        "latency_p90_ms": round(q(0.90) * 1000, 1) if lat.size else None,
        "latency_p99_ms": round(q(0.99) * 1000, 1) if lat.size else None,
        "batch_size_histogram": stats.get("batch_size_histogram"),
        "device": device,
    }))
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
