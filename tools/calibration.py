"""Host-speed calibration anchor for the bench protocol (VERDICT r9
task 2): this sandbox host's absolute speed swings ±30-40% between
sessions (documented in bench.py and BENCH_DETAIL history), which made
identical-code rounds read as regressions. Every BENCH_r{N}.json now
carries one pinned CPU-bound measurement taken in the same session;
dividing query seconds by it cancels the host factor, so cross-round
per-query comparisons become plan comparisons again.

The anchor is a chained single-thread SHA-256 loop: pure CPU, fixed
working set (1 MiB buffer), no allocation growth, no I/O, not
JIT-dependent — the closest cheap proxy for "how fast is this host
executing one core's worth of work right now".
"""

from __future__ import annotations

import hashlib
import time

_BUF = bytes(range(256)) * 4096  # 1 MiB, deterministic
_BLOCKS = 512  # 512 MiB hashed per rep


def cpu_anchor_sec(reps: int = 3) -> float:
    """Median wall-seconds of the pinned hash loop over ``reps`` runs
    (median rejects a stray scheduling hiccup). Chaining the digest
    into the next block defeats any conceivable caching."""
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        h = b""
        for _ in range(_BLOCKS):
            h = hashlib.sha256(_BUF + h).digest()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return round(runs[len(runs) // 2], 4)
