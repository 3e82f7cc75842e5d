"""Host-window probe for bench recording: burn CPU while sampling
/proc/stat, and report the steal share UNDER LOAD. The bench host shows
minutes-long steal bursts (documented r10-r12: identical-code totals
spanning 79 -> 109 s with 6-7% steal measured during the inflated
runs), and the hypervisor only steals from busy guests — an idle probe
reads ~0% steal in the middle of a burst — so the probe must be loaded
to be predictive. Recording protocol: probe, and only record
BENCH_LOCAL.json when the window is clean (steal < ~1% under load);
otherwise wait and re-probe.

    python tools/hostcheck.py [seconds] [threads]   # default 20s, 16
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def sample() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _burn(stop_at: float) -> None:
    # real CPU work in a PROCESS (threads would serialize on the GIL
    # and load one core at most)
    x = 1.0
    while time.time() < stop_at:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-9


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    nproc = (
        int(sys.argv[2])
        if len(sys.argv) > 2
        else min(16, (os.cpu_count() or 4) // 2)
    )
    stop_at = time.time() + secs
    procs = [
        mp.Process(target=_burn, args=(stop_at,), daemon=True)
        for _ in range(nproc)
    ]
    a = sample()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    b = sample()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    steal = d[7] / tot
    verdict = "CLEAN" if steal < 0.01 else "DEGRADED"
    print(
        f"{verdict} steal={steal:.2%} user={d[0] / tot:.2%} "
        f"idle={d[3] / tot:.2%} ({nproc} burn procs, {secs:.0f}s)"
    )
    sys.exit(0 if steal < 0.01 else 1)


if __name__ == "__main__":
    main()
