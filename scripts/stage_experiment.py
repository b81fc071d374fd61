#!/usr/bin/env python
"""Stage-scaling experiment: the fetch+extract map stage at several pinned
core counts, pandas_udf vs mapInArrow implementations, TRIALS trials each.
Prints one JSON line per (cores, impl, trial). Used to pick the scaling-bench
geometry and extraction implementation; not part of the driver surface."""

import json
import os
import subprocess
import sys

CORES = [int(c) for c in os.environ.get("EXP_CORES", "4,16").split(",")]
TRIALS = int(os.environ.get("EXP_TRIALS", "3"))
PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "4800000"))
BODY = int(os.environ.get("BENCH_BODY_REPEAT", "32"))
IMPLS = os.environ.get("EXP_IMPLS", "pandas,arrow").split(",")

CODE = r"""
import sys, time
impl = sys.argv[1]
cpus = int(sys.argv[2])
corpus_path = sys.argv[3]
from pyspark.sql import functions as F
from abot_dotnet_core_spark.session import get_spark
from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.functions import udfs
spark = get_spark('stage', cpus=cpus, shuffle_partitions=max(cpus, 8))
corpus = spark.read.parquet(corpus_path).select('url', 'html')

if impl == 'pandas':
    udf = udfs.make_extract_page_udf(CrawlConfig())
    args = (F.col('html'), F.lit(None).cast('string'), F.col('url'),
            F.lit(True), F.lit(None).cast('string'))
    def run(df):
        return (df.withColumn('p', udf(*args))
                .select(F.sum(F.size('p.links'))).collect()[0][0])
else:
    from abot_dotnet_core_spark.functions.arrow_extract import \
        extract_pages_arrow
    def run(df):
        out = extract_pages_arrow(df, CrawlConfig())
        return out.select(F.sum(F.size('links'))).collect()[0][0]

run(corpus.limit(2000))        # JIT + worker warmup
t0 = time.time()
n = run(corpus)
print('STAGESEC', time.time() - t0, n)
"""


def main() -> None:
    corpus = f"/root/repo/.bench/corpus_{PAGES}_b{BODY}/corpus.parquet"
    results = []
    for cores in CORES:
        for impl in IMPLS:
            for t in range(TRIALS):
                out = subprocess.run(
                    ["taskset", "-c", f"0-{cores - 1}", sys.executable,
                     "-c", CODE, impl, str(cores), corpus],
                    capture_output=True, text=True, cwd="/root/repo",
                    timeout=3600)
                sec = links = None
                for line in out.stdout.splitlines():
                    if line.startswith("STAGESEC "):
                        _, sec, links = line.split()
                rec = {"cores": cores, "impl": impl, "trial": t,
                       "sec": float(sec) if sec else None,
                       "links": int(links) if links else None}
                if sec is None:
                    rec["err"] = out.stderr[-800:]
                print(json.dumps(rec), flush=True)
                results.append(rec)


if __name__ == "__main__":
    main()
