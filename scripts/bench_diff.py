"""Per-query bench regression diff between two rounds' BENCH artifacts.

Usage::

    python scripts/bench_diff.py BENCH_r02.json BENCH_r03.json [top_n]
    python scripts/bench_diff.py BENCH_r02.json .bench/BENCH_DETAIL.json

Accepts either the driver's BENCH_r{N}.json wrapper (reads ``parsed``) or a
raw bench.py JSON object / BENCH_DETAIL.json. Prints a markdown table of
the ``top_n`` (default 10) worst regressions by ratio among queries timed
in both rounds, plus the biggest improvements and any added/removed
queries — the table VERDICT r02 task 6 asks to cite in BENCH/BASELINE.md.
Timings below ``--floor`` seconds (default 0.3) in BOTH rounds are skipped:
sub-300ms samples on a shared box are scheduler noise, not signal.
"""

import json
import sys


def load_queries(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no parseable queries map")
    # the queries map mixes seconds with throughput gauges — diff seconds
    return {k: float(v) for k, v in q.items()
            if isinstance(v, (int, float))
            and not k.endswith("_urls_per_sec")}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    floor = 0.3
    old, new = load_queries(old_path), load_queries(new_path)
    both = sorted(set(old) & set(new))
    rows = []
    for k in both:
        if old[k] < floor and new[k] < floor:
            continue
        ratio = new[k] / max(old[k], 1e-9)
        rows.append((ratio, k, old[k], new[k]))
    rows.sort(reverse=True)

    def table(items, title):
        print(f"\n### {title}\n")
        print("| query | old s | new s | ratio |")
        print("|---|---|---|---|")
        for ratio, k, o, n in items:
            print(f"| {k} | {o:.3f} | {n:.3f} | {ratio:.2f}x |")

    regs = [r for r in rows if r[0] > 1.05][:top_n]
    imps = [r for r in reversed(rows) if r[0] < 0.95][:top_n]
    table(regs or [], f"Top regressions ({old_path} -> {new_path})")
    table(imps or [], "Top improvements")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"\nremoved: {', '.join(removed)}")
    tot_old = sum(old[k] for _r, k, _o, _n in rows)
    tot_new = sum(new[k] for _r, k, _o, _n in rows)
    print(f"\ncomparable-suite total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / max(tot_old, 1e-9):.2f}x over {len(rows)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
