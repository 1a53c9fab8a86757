"""Per-stage peak memory tracking.

Mirrors /root/reference/src/pipeline/memory_tracker.rs:16-249: a background
sampler thread polls process RSS every 5 ms keeping an atomic max, and the
device is synchronized BEFORE reading accelerator memory (the async-compute
caveat documented at memory_tracker.rs:1-5). The reference reads GPU memory
via cuMemGetInfo_v2 (used = total − free); here device memory comes from
JAX's per-device `memory_stats()` (bytes_in_use / bytes_limit), which libtpu
exposes on real chips; None where the backend doesn't report it.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

SAMPLE_INTERVAL_S = 0.005  # 5 ms, memory_tracker.rs:26


@dataclass
class DeviceMemorySnapshot:
    used: int
    total: int


@dataclass
class StageMemory:
    peak_rss_bytes: int = 0
    device: Optional[DeviceMemorySnapshot] = None


@dataclass
class StageMemoryMap:
    forward: Optional[StageMemory] = None
    post: Optional[StageMemory] = None
    dp: Optional[StageMemory] = None
    group: Optional[StageMemory] = None
    conf: Optional[StageMemory] = None
    extras: dict = field(default_factory=dict)


def read_process_rss_bytes() -> int:
    """Linux /proc/self/statm reader (the reference has per-OS readers,
    memory_tracker.rs:170-249; this environment is Linux)."""
    try:
        fields = Path("/proc/self/statm").read_text().split()
        return int(fields[1]) * 4096  # resident pages × page size
    except (OSError, IndexError, ValueError):
        return 0


def device_memory_snapshot() -> Optional[DeviceMemorySnapshot]:
    """Device memory (used/total) after the caller has synchronized."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if not stats:
            return None
        used = stats.get("bytes_in_use")
        total = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if used is None:
            return None
        return DeviceMemorySnapshot(used=int(used), total=int(total or 0))
    except Exception:
        return None


class MemoryTracker:
    """measure(stage, sync_fn, f): runs f while a sampler thread tracks peak
    RSS; syncs the device before reading device memory
    (memory_tracker.rs:109-168)."""

    def __init__(self):
        self.stages = StageMemoryMap()

    def measure(self, stage: str, sync_fn: Callable[[], None], f: Callable):
        peak = {"rss": read_process_rss_bytes()}
        stop = threading.Event()

        def sampler():
            while not stop.is_set():
                rss = read_process_rss_bytes()
                if rss > peak["rss"]:
                    peak["rss"] = rss
                stop.wait(SAMPLE_INTERVAL_S)

        thread = threading.Thread(target=sampler, daemon=True)
        thread.start()
        try:
            result = f()
        finally:
            # device must be idle before reading accelerator memory
            sync_fn()
            stop.set()
            thread.join(timeout=1.0)

        mem = StageMemory(
            peak_rss_bytes=peak["rss"], device=device_memory_snapshot()
        )
        if hasattr(self.stages, stage):
            setattr(self.stages, stage, mem)
        else:
            self.stages.extras[stage] = mem
        return result
