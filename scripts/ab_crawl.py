#!/usr/bin/env python
"""Interleaved A/B of the full mega-round crawl: extract_impl=arrow vs
pandas, same pinned core count, alternating trials so hypervisor-steal
drift hits both arms equally. Prints one JSON line per trial."""

import json
import os
import subprocess
import sys

CORES = int(os.environ.get("AB_CORES", "16"))
TRIALS = int(os.environ.get("AB_TRIALS", "2"))
PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "4800000"))
BODY = int(os.environ.get("BENCH_BODY_REPEAT", "32"))

CODE = (
    "import json\n"
    "from abot_dotnet_core_spark.session import get_spark\n"
    "import bench\n"
    f"spark = get_spark('ab', cpus={CORES}, shuffle_partitions={max(CORES, 8)})\n"
    f"res = bench.bench_crawl_mega(spark, {PAGES}, '/root/repo/.bench', "
    f"body_repeat={BODY})\n"
    "print('ABRESULT ' + json.dumps(res['per_round']))\n"
)


def main() -> None:
    for t in range(TRIALS):
        for impl in ("arrow", "pandas"):
            env = dict(os.environ, BENCH_EXTRACT_IMPL=impl,
                       BENCH_CRAWL_PAGES=str(PAGES), BENCH_SKIP_QUERIES="1")
            out = subprocess.run(
                ["taskset", "-c", f"0-{CORES - 1}", sys.executable,
                 "-c", CODE], env=env, capture_output=True, text=True,
                cwd="/root/repo", timeout=7200)
            rounds = None
            for line in out.stdout.splitlines():
                if line.startswith("ABRESULT "):
                    rounds = json.loads(line[len("ABRESULT "):])
            rec = {"impl": impl, "trial": t, "cores": CORES,
                   "rounds": rounds}
            if rounds is None:
                rec["err"] = out.stderr[-800:]
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
