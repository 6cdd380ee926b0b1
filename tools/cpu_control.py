"""Machine-ceiling control for the pinned scaling sweeps (BASELINE.md).

Pure-CPU md5 loop over a process pool — no Spark, no shared state, no
memory pressure — pinned exactly like the engine legs.  Whatever 2->8
core ratio THIS measures is the best any workload can do on the box in
the same window; compare the engine's phase ratios against it before
attributing sub-linear scaling to the plan.

Usage: taskset -c 0,1 python tools/cpu_control.py 2
       taskset -c 0-7 python tools/cpu_control.py 8
"""

import hashlib
import multiprocessing as mp
import sys
import time

TASKS = 32  # fixed total work, like the fixed-input engine legs


def work(_):
    h = b"x" * 64
    for _ in range(600_000):
        h = (hashlib.md5(h).digest() + h[:48])[:64]
    return 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else mp.cpu_count()
    t0 = time.perf_counter()
    with mp.Pool(n) as p:
        p.map(work, range(TASKS))
    print(round(time.perf_counter() - t0, 2))
