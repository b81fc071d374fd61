#!/usr/bin/env python
"""Machine scaling ceilings that bound ANY job's N->4N core efficiency on
this single-socket sandbox VM — no Spark involved.

Two workloads, K pinned worker processes each:

  cpu   md5 + regex over a ~20 KB L2-resident buffer: pure compute,
        no DRAM traffic. Measures hypervisor-steal / SMT effects only.
  mem   stream-sum a 512 MB private array: pure DRAM bandwidth,
        the regime of parquet decode -> Arrow IPC -> UTF-8/html scanning.

Prints aggregate throughput per K and the 4->16 / 2->8 efficiencies.
Used to attribute the crawl bench's whole-round scaling number to the
box's shared memory bus (one socket = one bus; a real cluster's 4N
executors bring 4N buses). See BENCH/BASELINE.md.
"""

import os
import re
import sys
import time
from multiprocessing import Process, Queue

DUR = float(os.environ.get("CEIL_DUR", "10"))
KS = [int(k) for k in os.environ.get("CEIL_KS", "2,4,8,16").split(",")]

BUF = b"<a href='http://example.com/x'>link text</a> " * 450  # ~20 KB
RX = re.compile(rb"href='([^']+)'")
MB = 512


def cpu_worker(core: int, q: Queue) -> None:
    import hashlib
    os.sched_setaffinity(0, {core})
    n, t0 = 0, time.time()
    while time.time() - t0 < DUR:
        hashlib.md5(BUF).hexdigest()
        RX.findall(BUF)
        n += 1
    q.put(n / DUR)


def mem_worker(core: int, q: Queue) -> None:
    import numpy as np
    os.sched_setaffinity(0, {core})
    a = np.random.randint(0, 255, size=(MB * 1024 * 1024 // 8,),
                          dtype=np.int64)
    n, t0 = 0, time.time()
    while time.time() - t0 < DUR:
        a.sum()
        n += 1
    q.put(n * MB / 1024.0 / (time.time() - t0))  # GB/s


def run(worker, k: int) -> float:
    q: Queue = Queue()
    ps = [Process(target=worker, args=(i, q)) for i in range(k)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> None:
    for name, worker, unit in (("cpu", cpu_worker, "iter/s"),
                               ("mem", mem_worker, "GB/s")):
        agg = {}
        for k in KS:
            agg[k] = run(worker, k)
            print(f"{name} k={k}: {agg[k]:.1f} {unit}", flush=True)
        for lo, hi in ((2, 8), (4, 16)):
            if lo in agg and hi in agg:
                eff = (agg[hi] / agg[lo]) / (hi // lo)
                print(f"{name} {lo}->{hi} efficiency: {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
