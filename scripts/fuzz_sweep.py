"""Extended offline fuzz sweep: replay the test fuzzer's generators over a
wide seed range and report any engine-vs-simulator parity mismatch.

Not part of CI (tests pin seeds 0-13 / 0-5); this is the exploration tool —
run `python scripts/fuzz_sweep.py START END [polite]`, failures print a
replayable case_seed and keep going.
"""

import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.session import get_spark
from abot_dotnet_core_spark.sources.corpus import write_parquet
from test_engine_fuzz_parity import (SEED_URL, draw_case, draw_delegates,
                                     draw_polite_case, draw_polite_delegates,
                                     engine_kwargs, simulator_result)


def run_case(spark, case_seed: int, polite: bool,
             resume_after: int = 0) -> list[str]:
    spec, cfg = (draw_polite_case if polite else draw_case)(case_seed)
    dg = (draw_polite_delegates(case_seed) if polite
          else draw_delegates(case_seed))
    tmp = tempfile.mkdtemp(prefix=f"fuzz{case_seed}_")
    errs = []
    try:
        write_parquet(spec, f"{tmp}/corpus", with_edges=False)
        sim = simulator_result(spec, cfg, delegates=dg)
        kw = dict(
            corpus_path=f"{tmp}/corpus/corpus.parquet",
            corpus_meta_path=f"{tmp}/corpus/corpus_meta.parquet",
            store_root=f"{tmp}/state",
            robots_path=f"{tmp}/corpus/robots.parquet",
            delegates=dg,
            **({} if polite else engine_kwargs(case_seed)),
        )
        eng = CrawlEngine(spark, cfg, **kw)
        eng.seed([SEED_URL])
        if resume_after > 0:
            # interrupt mid-crawl and rebuild from the committed snapshot —
            # the resumed crawl must be indistinguishable from an unbroken one
            eng.run(max_rounds=resume_after, politeness=polite)
            eng = CrawlEngine.resume(spark, cfg, **kw)
        eng.run(max_rounds=300, politeness=polite)

        rows = eng.store.read_events(spark, "crawled").collect()
        if polite:
            got = sorted((r["url"], r["status"], r["is_retry"],
                          r["retry_count"]) for r in rows)
            want = sorted((c.url, c.status, c.is_retry, c.retry_count)
                          for c in sim.crawled)
        else:
            rows.sort(key=lambda r: r["crawl_order"])
            got = [(r["url"], r["status"], r["depth"], r["is_retry"],
                    r["retry_count"]) for r in rows]
            want = [(c.url, c.status, c.depth, c.is_retry, c.retry_count)
                    for c in sim.crawled]
        if got != want:
            diff = next((i for i, (g, w) in enumerate(zip(got, want))
                         if g != w), min(len(got), len(want)))
            errs.append(f"crawled mismatch len {len(got)} vs {len(want)}; "
                        f"first diff at {diff}: "
                        f"got={got[diff:diff+2]} want={want[diff:diff+2]}")

        eng_seen = {r["url_hash"] for r in eng._read_seen().collect()}
        if eng_seen != sim.seen_hashes():
            errs.append(f"seen-set: extra={len(eng_seen - sim.seen_hashes())}"
                        f" missing={len(sim.seen_hashes() - eng_seen)}")

        dis = eng.store.read_events(spark, "disallowed").collect()
        got_dis = sorted((r["url"], r["reason"]) for r in dis)
        want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                          if e.stage in ("links", "schedule"))
        if got_dis != want_dis:
            gset, wset = set(got_dis), set(want_dis)
            errs.append(f"disallowed: extra={sorted(gset - wset)[:4]} "
                        f"missing={sorted(wset - gset)[:4]}")
    except Exception:
        errs.append("EXCEPTION\n" + traceback.format_exc())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return errs


def main():
    start, end = int(sys.argv[1]), int(sys.argv[2])
    polite = "polite" in sys.argv[3:]
    resume_after = 2 if "resume" in sys.argv[3:] else 0
    spark = get_spark("fuzz_sweep", cpus=8, shuffle_partitions=8)
    failures = 0
    for seed in range(start, end):
        t0 = time.time()
        errs = run_case(spark, seed, polite, resume_after=resume_after)
        tag = ("POLITE" if polite else "MAIN") \
            + ("+RESUME" if resume_after else "")
        if errs:
            failures += 1
            print(f"FAIL {tag} case_seed={seed} ({time.time()-t0:.1f}s)")
            for e in errs:
                print("   ", e.replace("\n", "\n    "))
        else:
            print(f"ok   {tag} case_seed={seed} ({time.time()-t0:.1f}s)",
                  flush=True)
    print(f"DONE {start}..{end} polite={polite} failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
