"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1-F3, F6).

Generates the exact ``input_hint`` table
``corpus(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus oracle sidecars:

- ``corpus_meta(url, status, content_type, content_length, redirect_to)``
- ``robots(domain, robots_txt)``
- ``seeds(url, round)``
- ``edges(src_url, link_pos, dst_url)`` (golden link graph, computed by the
  same kernel extractor the engine UDF uses)

Graph shape mirrors the reference SiteSimulator (home -> hub pages -> leaves
with a 5:1:2:3:4 status mix of 200:403:404:500:503,
/root/reference/Abot/src/Abot.SiteSimulator/Controllers/PageGeneratorController.cs:35-84)
generalized to many domains, with FIXTURES.md F6 skew knobs: one hot domain
holding ~30% of URLs, a long tail of tiny domains, ~40% duplicate links, and
robots crawl-delays spread over {0, 1, 5, 20} s.

Determinism: every random choice is ``md5(seed:key)``-derived — same spec =>
byte-identical tables, across processes and executors (no RNG state).

At bench scale the corpus is generated *distributed* (mapInPandas over
``spark.range``) so a 10^6+-page fixture never materializes on the driver.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timezone

import pandas as pd

from ..kernel.extract import extract_links, golden_text
from ..kernel.simulator import PageRecord

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_STATUS_WHEEL = [200, 200, 200, 200, 200, 403, 404, 404, 500, 500, 500,
                 503, 503, 503, 503]  # 5:1:2:3:4 like PageGeneratorController

_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua ut enim "
          "ad minim veniam quis nostrud exercitation ullamco laboris nisi ")

_ROBOTS_VARIANTS = [
    None,                                                   # no robots.txt
    "User-agent: *\nDisallow:\n",                           # allow all
    "User-agent: *\nDisallow: /blocked\n",                  # subtree block
    "User-agent: *\nDisallow: /blocked\nCrawl-delay: 1\n",
    "User-agent: *\nCrawl-delay: 5\n",
    "User-agent: *\nDisallow: /blocked\nCrawl-delay: 20\n",
    "User-agent: badagent\nDisallow: /\n\nUser-agent: *\nDisallow: /blocked\n",
]


def det_int(seed: int, key: str, mod: int) -> int:
    """Deterministic pseudo-random int in [0, mod)."""
    h = hashlib.md5(f"{seed}:{key}".encode()).digest()
    return int.from_bytes(h[:8], "big") % mod


@dataclass(frozen=True)
class CorpusSpec:
    n_pages: int = 70               # total across all domains
    n_domains: int = 4
    branching: int = 4              # tree fan-out within a domain
    hot_domain_share: float = 0.0   # fraction of pages on domain 0 (F6 skew)
    dup_link_rate: float = 0.4
    cross_link_rate: float = 0.15
    charset_1251_rate: float = 0.05
    # header-ONLY charset pages: Content-Type header declares windows-1251 but
    # the body has NO <meta charset> tag — the fixture that catches a fetch
    # path ignoring the header charset (WebContentExtractor.cs:59: header
    # CharSet wins over the body sniff)
    header_only_1251_rate: float = 0.0
    # pages carrying an X-Robots-Tag: nofollow response header (T4 gate)
    x_robots_nofollow_rate: float = 0.0
    # fraction of 503 pages carrying a Retry-After: <seconds> header (S4)
    retry_after_rate: float = 0.0
    body_repeat: int = 8            # lorem blocks per page (~1 KB each 6 reps)
    error_rate: float = 1.0         # fraction of non-hub pages drawing from
                                    # the 5:1:2:3:4 status wheel (1.0 = all,
                                    # like the reference SiteSimulator)
    seed: int = 42

    def domain_sizes(self) -> list[int]:
        n, d = self.n_pages, self.n_domains
        if d == 1:
            return [n]
        if self.hot_domain_share > 0:
            hot = max(1, int(n * self.hot_domain_share))
            rest = n - hot
            base = [hot] + [rest // (d - 1)] * (d - 1)
        else:
            base = [n // d] * d
        base[-1] += n - sum(base)
        return base


def domain_name(i: int) -> str:
    return f"d{i}.test"


def page_url(i: int, j: int) -> str:
    return f"http://{domain_name(i)}/" if j == 0 else f"http://{domain_name(i)}/p{j}"


def page_status(spec: CorpusSpec, i: int, j: int) -> int:
    """Home + first-level hubs are always 200 so the crawl can spread."""
    if j <= spec.branching:
        return 200
    if (spec.error_rate < 1.0
            and det_int(spec.seed, f"errsel:{i}:{j}", 10_000)
            >= spec.error_rate * 10_000):
        return 200
    return _STATUS_WHEEL[det_int(spec.seed, f"status:{i}:{j}", len(_STATUS_WHEEL))]


def _charset_1251(spec: CorpusSpec, i: int, j: int) -> bool:
    return det_int(spec.seed, f"cs:{i}:{j}", 10_000) < spec.charset_1251_rate * 10_000


def _header_only_1251(spec: CorpusSpec, i: int, j: int) -> bool:
    """Header-declared charset with no meta tag (disjoint from _charset_1251)."""
    return (not _charset_1251(spec, i, j)
            and det_int(spec.seed, f"hocs:{i}:{j}", 10_000)
            < spec.header_only_1251_rate * 10_000)


def _x_robots(spec: CorpusSpec, i: int, j: int) -> str | None:
    if det_int(spec.seed, f"xr:{i}:{j}", 10_000) < spec.x_robots_nofollow_rate * 10_000:
        return "nofollow"
    return None


def _retry_after(spec: CorpusSpec, i: int, j: int, status: int) -> str | None:
    """Retry-After header seconds (only on 503s, like real servers)."""
    if (status == 503 and det_int(spec.seed, f"ra:{i}:{j}", 10_000)
            < spec.retry_after_rate * 10_000):
        return str(30 + det_int(spec.seed, f"ras:{i}:{j}", 4) * 30)
    return None


def page_links(spec: CorpusSpec, i: int, j: int, sizes: list[int]) -> list[str]:
    """Deterministic in-page hrefs (relative + absolute + decoys)."""
    n_i = sizes[i]
    links: list[str] = []
    b = spec.branching
    for c in range(j * b + 1, min(j * b + b + 1, n_i)):
        links.append(f"/p{c}" if det_int(spec.seed, f"rel:{i}:{j}:{c}", 2) == 0
                     else page_url(i, c))
    # duplicate link back to parent (exercises the seen anti-join)
    if j > 0 and det_int(spec.seed, f"dup:{i}:{j}", 10_000) < spec.dup_link_rate * 10_000:
        links.append(f"/p{(j - 1) // b}" if (j - 1) // b > 0 else "/")
    # cross-domain link (external unless multi-seed crawl)
    if det_int(spec.seed, f"x:{i}:{j}", 10_000) < spec.cross_link_rate * 10_000:
        links.append(page_url((i + 1) % len(sizes), 0))
    # fragment + mailto decoys on some pages
    if det_int(spec.seed, f"frag:{i}:{j}", 5) == 0:
        links.append(f"/p{j}#section-{j}")
    if det_int(spec.seed, f"mail:{i}:{j}", 7) == 0:
        links.append("mailto:owner@" + domain_name(i))
    return links


def page_html_text(spec: CorpusSpec, i: int, j: int, sizes: list[int]) -> str:
    """Deterministic HTML (decoded form). Includes entity-encoded hrefs,
    comment/script decoys and occasional meta charset."""
    links = page_links(spec, i, j, sizes)
    anchors = []
    for k, href in enumerate(links):
        h = href.replace("&", "&amp;")
        anchors.append(f'<a href="{h}">link {k}</a>')
    meta = ""
    if _charset_1251(spec, i, j):
        meta = '<meta charset="windows-1251">'
    decoy = ("<!-- <a href='/decoy-comment'>x</a> -->"
             "<script>var a='<a href=\"/decoy-script\">x</a>';</script>")
    body_word = ("привет" if meta or _header_only_1251(spec, i, j)
                 else "page")
    body = f"<p>{body_word} {domain_name(i)} p{j} " + _LOREM * spec.body_repeat + "</p>"
    return (f"<html><head>{meta}<title>{domain_name(i)}/p{j}</title></head>"
            f"<body>{decoy}{''.join(anchors)}{body}</body></html>")


def content_type_of(spec: CorpusSpec, i: int, j: int) -> str:
    if _charset_1251(spec, i, j) or _header_only_1251(spec, i, j):
        return "text/html; charset=windows-1251"
    # a sliver of non-html rows to exercise P11
    if j > spec.branching and det_int(spec.seed, f"ct:{i}:{j}", 50) == 0:
        return "image/jpeg"
    return "text/html"


def encode_html(spec: CorpusSpec, i: int, j: int, html_text: str) -> bytes:
    if _charset_1251(spec, i, j) or _header_only_1251(spec, i, j):
        return html_text.encode("windows-1251", errors="replace")
    return html_text.encode("utf-8")


def make_row(spec: CorpusSpec, i: int, j: int, sizes: list[int]) -> dict:
    url = page_url(i, j)
    html_text = page_html_text(spec, i, j, sizes)
    raw = encode_html(spec, i, j, html_text)
    ct = content_type_of(spec, i, j)
    status = page_status(spec, i, j)
    ts = EPOCH + pd.Timedelta(seconds=det_int(spec.seed, f"ts:{url}", 30 * 86400))
    ru = _charset_1251(spec, i, j) or _header_only_1251(spec, i, j)
    return {
        "url": url,
        "warc_ts": ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts,
        "html": raw,
        "text": golden_text(raw, ct),      # byte-identical-per-url invariant
        "lang": "ru" if ru else "en",
        "status": status,
        "content_type": ct,
        "content_length": len(raw),
        "redirect_to": None,
        "x_robots": _x_robots(spec, i, j),
        "retry_after": _retry_after(spec, i, j, status),
    }


def robots_txt_for(spec: CorpusSpec, i: int) -> str | None:
    return _ROBOTS_VARIANTS[det_int(spec.seed, f"robots:{i}", len(_ROBOTS_VARIANTS))]


# --------------------------------------------------------------------------
# Small-scale (pandas) generation — also feeds the oracle simulator
# --------------------------------------------------------------------------

def generate_rows(spec: CorpusSpec):
    sizes = spec.domain_sizes()
    for i in range(len(sizes)):
        for j in range(sizes[i]):
            yield make_row(spec, i, j, sizes)


def generate_tables(spec: CorpusSpec, with_edges: bool = True) -> dict[str, pd.DataFrame]:
    rows = list(generate_rows(spec))
    corpus = pd.DataFrame([{k: r[k] for k in
                            ("url", "warc_ts", "html", "text", "lang")} for r in rows])
    meta = pd.DataFrame([{k: r[k] for k in
                          ("url", "status", "content_type", "content_length",
                           "redirect_to", "x_robots", "retry_after")}
                         for r in rows])
    robots = pd.DataFrame([
        {"domain": domain_name(i), "robots_txt": robots_txt_for(spec, i)}
        for i in range(spec.n_domains)
        if robots_txt_for(spec, i) is not None],
        columns=["domain", "robots_txt"])
    seeds = pd.DataFrame([{"url": page_url(0, 0), "round": 0}])
    out = {"corpus": corpus, "corpus_meta": meta, "robots": robots, "seeds": seeds}
    if with_edges:
        edge_rows = []
        for r in rows:
            if r["status"] == 200 and r["content_type"].startswith("text/html"):
                for pos, dst in enumerate(extract_links(r["text"], r["url"])):
                    edge_rows.append({"src_url": r["url"], "link_pos": pos,
                                      "dst_url": dst})
        out["edges"] = pd.DataFrame(edge_rows,
                                    columns=["src_url", "link_pos", "dst_url"])
    return out


def to_simulator_corpus(spec: CorpusSpec) -> dict[str, PageRecord]:
    """The same corpus as the in-memory dict the oracle simulator consumes."""
    sizes = spec.domain_sizes()
    out: dict[str, PageRecord] = {}
    for i in range(len(sizes)):
        for j in range(sizes[i]):
            r = make_row(spec, i, j, sizes)
            out[r["url"]] = PageRecord(
                status=r["status"], content_type=r["content_type"],
                html=r["text"], content_length=r["content_length"],
                redirect_to=r["redirect_to"], x_robots=r["x_robots"],
                retry_after=r["retry_after"])
    return out


def write_parquet(spec: CorpusSpec, outdir: str, with_edges: bool = True) -> None:
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, df in generate_tables(spec, with_edges=with_edges).items():
        # Spark's reader rejects TIMESTAMP(NANOS); write microseconds.
        df.to_parquet(f"{outdir}/{name}.parquet", index=False,
                      coerce_timestamps="us", allow_truncated_timestamps=True)


# --------------------------------------------------------------------------
# Bench-scale (distributed) generation
# --------------------------------------------------------------------------

def generate_spark(spark, spec: CorpusSpec, outdir: str, partitions: int = 64) -> None:
    """Distributed corpus generation: one spark.range over page ids, each
    executor materializes its slice deterministically. No driver-side rows."""
    from pyspark.sql import functions as F, types as T

    sizes = spec.domain_sizes()
    # page id -> (domain i, page j) via cumulative offsets (broadcast-small)
    offsets = []
    acc = 0
    for n in sizes:
        offsets.append(acc)
        acc += n

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("x_robots", T.StringType()),
        T.StructField("retry_after", T.StringType()),
    ])

    def gen(batches):
        import bisect
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                i = bisect.bisect_right(offsets, int(gid)) - 1
                j = int(gid) - offsets[i]
                rows.append(make_row(spec, i, j, sizes))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    df = (spark.range(0, spec.n_pages, 1, partitions)
          .mapInPandas(gen, schema=schema))
    (df.select("url", "warc_ts", "html", "text", "lang")
       .write.mode("overwrite").parquet(f"{outdir}/corpus.parquet"))
    (df.select("url", "status", "content_type", "content_length",
               "redirect_to", "x_robots", "retry_after")
       .write.mode("overwrite").parquet(f"{outdir}/corpus_meta.parquet"))

    robots = pd.DataFrame([
        {"domain": domain_name(i), "robots_txt": robots_txt_for(spec, i)}
        for i in range(spec.n_domains)
        if robots_txt_for(spec, i) is not None],
        columns=["domain", "robots_txt"])
    seeds = pd.DataFrame([{"url": page_url(i, 0), "round": 0}
                          for i in range(spec.n_domains)])
    import os
    os.makedirs(outdir, exist_ok=True)
    robots.to_parquet(f"{outdir}/robots.parquet", index=False)
    seeds.to_parquet(f"{outdir}/seeds.parquet", index=False)
    # written LAST: cache-validity sentinel — a killed run leaves no sentinel
    # and the whole directory is regenerated (corpus.parquet/_SUCCESS alone
    # does not cover the meta/robots/seeds files written after it)
    with open(f"{outdir}/_GENERATED", "w") as fh:
        fh.write("ok")


TINY = CorpusSpec(n_pages=70, n_domains=4)
SMALL = CorpusSpec(n_pages=10_000, n_domains=40, hot_domain_share=0.3,
                   error_rate=0.25)
BENCH = CorpusSpec(n_pages=300_000, n_domains=3_000, hot_domain_share=0.3,
                   body_repeat=2, error_rate=0.12, branching=8)
