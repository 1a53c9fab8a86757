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


def _read_rss_linux() -> int:
    try:
        fields = Path("/proc/self/statm").read_text().split()
        return int(fields[1]) * 4096  # resident pages × page size
    except (OSError, IndexError, ValueError):
        return 0


def _read_rss_windows() -> int:
    """GetProcessMemoryInfo → WorkingSetSize (memory_tracker.rs:196-218)."""
    try:
        import ctypes
        import ctypes.wintypes as wt

        class PMC(ctypes.Structure):
            _fields_ = [
                ("cb", wt.DWORD),
                ("PageFaultCount", wt.DWORD),
                ("PeakWorkingSetSize", ctypes.c_size_t),
                ("WorkingSetSize", ctypes.c_size_t),
                ("QuotaPeakPagedPoolUsage", ctypes.c_size_t),
                ("QuotaPagedPoolUsage", ctypes.c_size_t),
                ("QuotaPeakNonPagedPoolUsage", ctypes.c_size_t),
                ("QuotaNonPagedPoolUsage", ctypes.c_size_t),
                ("PagefileUsage", ctypes.c_size_t),
                ("PeakPagefileUsage", ctypes.c_size_t),
            ]

        pmc = PMC()
        pmc.cb = ctypes.sizeof(PMC)
        h = ctypes.windll.kernel32.GetCurrentProcess()
        if ctypes.windll.psapi.GetProcessMemoryInfo(
            h, ctypes.byref(pmc), pmc.cb
        ):
            return int(pmc.WorkingSetSize)
    except Exception:
        pass
    return 0


def _read_rss_macos() -> int:
    """libproc proc_pidinfo(PROC_PIDTASKINFO) → pti_resident_size
    (memory_tracker.rs:220-249)."""
    try:
        import ctypes
        import os

        libproc = ctypes.CDLL("libproc.dylib")
        PROC_PIDTASKINFO = 4

        class ProcTaskInfo(ctypes.Structure):
            _fields_ = [
                ("pti_virtual_size", ctypes.c_uint64),
                ("pti_resident_size", ctypes.c_uint64),
                ("pti_total_user", ctypes.c_uint64),
                ("pti_total_system", ctypes.c_uint64),
                ("pti_threads_user", ctypes.c_uint64),
                ("pti_threads_system", ctypes.c_uint64),
                ("pti_policy", ctypes.c_int32),
                ("pti_faults", ctypes.c_int32),
                ("pti_pageins", ctypes.c_int32),
                ("pti_cow_faults", ctypes.c_int32),
                ("pti_messages_sent", ctypes.c_int32),
                ("pti_messages_received", ctypes.c_int32),
                ("pti_syscalls_mach", ctypes.c_int32),
                ("pti_syscalls_unix", ctypes.c_int32),
                ("pti_csw", ctypes.c_int32),
                ("pti_threadnum", ctypes.c_int32),
                ("pti_numrunning", ctypes.c_int32),
                ("pti_priority", ctypes.c_int32),
            ]

        info = ProcTaskInfo()
        n = libproc.proc_pidinfo(
            os.getpid(), PROC_PIDTASKINFO, 0,
            ctypes.byref(info), ctypes.sizeof(info),
        )
        if n >= ctypes.sizeof(info):
            return int(info.pti_resident_size)
    except Exception:
        pass
    return 0


def _pick_rss_reader():
    import sys

    if sys.platform.startswith("linux"):
        return _read_rss_linux
    if sys.platform == "win32":
        return _read_rss_windows
    if sys.platform == "darwin":
        return _read_rss_macos
    return lambda: 0


_rss_reader = _pick_rss_reader()


def read_process_rss_bytes() -> int:
    """Current process resident set size. Per-OS readers mirror the
    reference's (memory_tracker.rs:170-249): Linux /proc/self/statm,
    Windows GetProcessMemoryInfo, macOS proc_pidinfo."""
    return _rss_reader()


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
