"""Peak-memory sampling for benchmark stages.

The reference samples GPU/CPU memory on a 0.1 s background thread and rolls
peaks into its benchmark results (benchmarking/memory_profiler/
memory_monitor.py:11-77, rollup benchmarking/results.py:14-122). The Spark
analog must cover the whole local process TREE: the python driver, the JVM
it spawns, and the Arrow python workers the JVM spawns — so the sampler
walks /proc over this process and all descendants and keeps the running
peak. Pure stdlib, Linux /proc only (degrades to rss=0 elsewhere).

Counts PSS (proportional set size, /proc/pid/smaps_rollup) rather than
VmRSS when the kernel provides it: the JVM continually fork()s short-lived
children while spawning processes (jspawnhelper), and each fork SHARES the
whole JVM heap copy-on-write — summing VmRSS attributes the full heap to
every such fork, overstating a 12 GB-heap build by 5x+ in bursts (r06
diagnosis; the r05 "build RSS doubled" reading carried this artifact —
measured fork PSS was ~40-160 kB against ~8-12 GB of attributed RSS). PSS
apportions shared pages across their mappers, so the tree sum is bounded
by true physical use. Falls back to statm RSS per process when smaps_rollup
is unavailable."""

from __future__ import annotations

import os
import threading
import time


def _pss_bytes(pid: int) -> int | None:
    """PSS (bytes) from smaps_rollup — shared pages apportioned, so COW
    forks of a big JVM cost what they physically use, not the full heap."""
    try:
        with open(f"/proc/{pid}/smaps_rollup") as f:
            for line in f:
                if line.startswith("Pss:"):
                    return int(line.split()[1]) * 1024
    except (OSError, IndexError, ValueError):
        return None
    return None


def _proc_tree_rss(root_pid: int) -> int:
    """Sum of PSS (fallback: VmRSS) bytes over root_pid + descendants."""
    children: dict[int, list[int]] = {}
    rss: dict[int, int] = {}
    try:
        pids = [int(p) for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return 0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])  # field 4; fields 1-3 consumed by rsplit
            with open(f"/proc/{pid}/statm") as f:
                pages = int(f.read().split()[1])  # resident pages
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(pid)
        rss[pid] = pages * os.sysconf("SC_PAGE_SIZE")
    total, stack, seen = 0, [root_pid], set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        if pid in rss:
            pss = _pss_bytes(pid)
            total += pss if pss is not None else rss[pid]
        stack.extend(children.get(pid, []))
    return total


class MemorySampler:
    """0.1 s background sampler; use as a context manager per stage.

    with MemorySampler() as ms: ...work...
    ms.peak_bytes  -> peak process-tree RSS observed during the stage
    """

    def __init__(self, interval_s: float = 0.1):
        self.interval_s = interval_s
        self.peak_bytes = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        pid = os.getpid()
        while not self._stop.is_set():
            cur = _proc_tree_rss(pid)
            if cur > self.peak_bytes:
                self.peak_bytes = cur
            self._stop.wait(self.interval_s)

    def __enter__(self) -> "MemorySampler":
        self.peak_bytes = _proc_tree_rss(os.getpid())
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> bool:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        return False

    @property
    def peak_mb(self) -> float:
        return round(self.peak_bytes / (1024 * 1024), 1)
