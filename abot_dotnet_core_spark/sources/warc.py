"""WARC source: read Common-Crawl-style WARC(.gz) segments into the
``input_hint`` corpus table shape, plus a deterministic fixture writer.

The engine's input table ``(url, warc_ts, html, text, lang)`` is
"Common-Crawl-style web pages"; Common Crawl's native container is WARC/1.0
(ISO 28500): a file is a sequence of records

    WARC/1.0\\r\\n <warc-headers> \\r\\n\\r\\n <Content-Length block> \\r\\n\\r\\n

and in the ``.warc.gz`` convention every record is its own gzip *member*, so
the concatenated file is still one valid gzip stream. A ``response`` record's
block is a full HTTP message (status line + headers + payload).

Scale posture: one Spark task per WARC file — ``spark.read.format
("binaryFile")`` yields whole-file rows (binary files are not splittable),
parsed in an Arrow-batched ``mapInPandas`` generator. That is exactly how
Common Crawl is processed in practice (a crawl is ~64k segment files of
~1 GB; per-file tasks keep a cluster dense with ZERO shuffle — parallelism
comes from file count, not intra-file splits). The parse is the unavoidable
Python step for a binary container format; everything downstream (text
extraction, lang-id, dedup, the crawl join) stays on the existing
JVM/Arrow paths.

Reference anchor: replaces the live-HTTP fetch surface
(/root/reference/Abot/src/Abot/Core/PageRequester.cs:64-119) for archived
crawls — status / content-type / payload come out of the stored HTTP
message instead of a socket, feeding the same decision cascade (P10-P12).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_CRLF2 = b"\r\n\r\n"
_MAGIC = b"WARC/"

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("warc_file", T.StringType()),
])


# ---------------------------------------------------------------------------
# record-level parsing (pure bytes -> dicts; exercised directly by tests)
# ---------------------------------------------------------------------------

def _parse_headers(blob: bytes) -> dict[str, str]:
    """Parse ``Name: value`` CRLF header lines (case-insensitive names)."""
    out: dict[str, str] = {}
    for line in blob.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            # utf-8 with replacement: round-trips the writer's utf-8
            # headers; never raises on arbitrary archive bytes
            out[k.strip().lower().decode("utf-8", "replace")] = \
                v.strip().decode("utf-8", "replace")
    return out


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an ``application/http; msgtype=response`` block into
    (status, content_type header, payload bytes)."""
    head_end = block.find(_CRLF2)
    if head_end < 0:
        return None, None, block
    head, payload = block[:head_end], block[head_end + 4:]
    first, _, rest = head.partition(b"\r\n")
    status = None
    parts = first.split(None, 2)
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    return status, _parse_headers(rest).get("content-type"), payload


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (multi-member) gzip stream, tolerating a truncated or
    corrupt final member: everything that decompressed cleanly is kept.
    ``gzip.GzipFile.read`` would instead raise EOFError and lose the whole
    segment."""
    import zlib
    out = []
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=47)        # gzip wrapper
        try:
            out.append(d.decompress(data[pos:]))
            out.append(d.flush())
        except zlib.error:
            break
        if not d.eof:                           # cut mid-member
            break
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def iter_warc_records(data: bytes, types: tuple = ("response", "resource")):
    """Yield dicts for the ``response``/``resource`` records in one WARC
    file's bytes (plain or gzip; multi-member gzip handled by GzipFile).
    Pass ``types=("conversion",)`` to read WET text-conversion records
    instead (the block is the payload, like a resource record).

    Malformed tails are tolerated: a record that can't be framed (no header
    terminator / short block) is skipped by re-scanning for the next
    ``WARC/`` magic, and a gzip stream cut mid-member keeps every fully
    decompressed byte — a truncated upload costs its last record, not the
    whole segment (and not the whole Spark task).
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC, pos)
        if start < 0:
            return
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + len(_MAGIC)
            continue
        block_start = head_end + 4
        block_end = block_start + length
        if block_end > n:     # truncated final record
            return
        pos = block_end       # next scan resumes after the block
        rtype = headers.get("warc-type", "").lower()
        if rtype not in types:
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        block = data[block_start:block_end]
        if rtype in ("response", "revisit") and "application/http" in \
                headers.get("content-type", ""):
            status, ctype, payload = _parse_http_block(block)
        else:                 # resource record: the block IS the payload
            status, ctype, payload = 200, headers.get("content-type"), block
        ts = None
        raw_ts = headers.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = None
        rec = {"url": url, "warc_ts": ts, "status": status,
               "content_type": ctype, "html": payload}
        if rtype == "revisit":
            # identical-payload-digest dedup pointers (ISO 28500 §6.7.2)
            dg = headers.get("warc-payload-digest", "")
            rec["payload_digest"] = dg.partition(":")[2] or dg or None
            rec["refers_to_url"] = headers.get("warc-refers-to-target-uri")
            ref_ts = None
            raw_ref = headers.get("warc-refers-to-date")
            if raw_ref:
                try:
                    ref_ts = datetime.strptime(raw_ref, "%Y-%m-%dT%H:%M:%SZ")
                except ValueError:
                    ref_ts = None
            rec["refers_to_ts"] = ref_ts
            rec["html"] = None    # a revisit block carries no payload
        yield rec


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_warc(spark, path: str) -> DataFrame:
    """Read a directory/glob of ``.warc`` / ``.warc.gz`` files into
    ``(url, warc_ts, status, content_type, html, warc_file)``.

    One task per file (binaryFile rows are whole files); the Arrow batch
    carries file bytes in, record rows out — no shuffle anywhere.
    """
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def gen(batches):
        # one output frame PER FILE: holding one segment's records at a time
        # caps worker memory at a single decompressed file, not the whole
        # Arrow batch (binaryFile can pack several files into one batch)
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in iter_warc_records(bytes(blob)):
                    rec["warc_file"] = os.path.basename(fpath)
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  WARC_SCHEMA.fields])

    return files.mapInPandas(gen, schema=WARC_SCHEMA)


REVISIT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload_digest", T.StringType()),
    T.StructField("refers_to_url", T.StringType()),
    T.StructField("refers_to_ts", T.TimestampType()),
    T.StructField("warc_file", T.StringType()),
])


def read_warc_revisits(spark, path: str) -> DataFrame:
    """Read the ``revisit`` records of a directory/glob of WARC files —
    the identical-payload-digest dedup pointers. Same per-file zero-shuffle
    posture as :func:`read_warc`."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def gen(batches):
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in iter_warc_records(bytes(blob),
                                             types=("revisit",)):
                    rec["warc_file"] = os.path.basename(fpath)
                    rec.pop("html", None)
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  REVISIT_SCHEMA.fields])

    return files.mapInPandas(gen, schema=REVISIT_SCHEMA)


def resolve_revisits(pages: DataFrame, revisits: DataFrame) -> DataFrame:
    """Rehydrate revisit records into full page rows: each revisit keeps
    its own (url, warc_ts, status, content_type) identity and takes the
    html of the record it refers to. ONE equi-join on the (url, ts)
    pointer — the referred originals are the dedup survivors, orders of
    magnitude below the revisit count on a boilerplate-heavy crawl.
    Union the result with ``pages`` for the logical full corpus."""
    orig = pages.select(F.col("url").alias("refers_to_url"),
                        F.col("warc_ts").alias("refers_to_ts"),
                        F.col("html").alias("orig_html"))
    return (revisits
            .join(orig, ["refers_to_url", "refers_to_ts"], "left")
            .select("url", "warc_ts", "status", "content_type",
                    F.col("orig_html").alias("html"), "warc_file"))


def warc_to_corpus(spark, path: str) -> DataFrame:
    """Project WARC records into the exact ``input_hint`` table
    ``(url, warc_ts, html, text, lang)``: charset-cascade text extraction
    (the same T5 kernel the crawl engine uses, so text is byte-identical to
    a live crawl of the same pages) + the set-based stopword lang-id."""
    from ..functions.textfns import with_lang_id
    from ..functions.udfs import extract_text_udf
    w = read_warc(spark, path)
    txt = w.withColumn("__t", extract_text_udf(F.col("html"),
                                               F.col("content_type")))
    corpus = txt.select("url", "warc_ts", "html",
                        F.col("__t.text").alias("text"))
    return (with_lang_id(corpus, "text")
            .select("url", "warc_ts", "html", "text",
                    F.col("lang_pred").alias("lang")))


# ---------------------------------------------------------------------------
# fixture writer (tests / synthetic segments — no external data)
# ---------------------------------------------------------------------------

def _record_id(url: str, ts: str) -> str:
    h = hashlib.md5(f"{url}:{ts}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>")


REVISIT_PROFILE = \
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def _fmt_ts(ts) -> str:
    ts = ts or datetime(1970, 1, 1)
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _write_records(f, records, compress: bool) -> int:
    """Stream ``response`` (and ``revisit``) records onto an open binary
    file object. A record with ``is_revisit`` true is written as a WARC
    ``revisit`` record (identical-payload-digest profile, ISO 28500
    §6.7.2 — the Common Crawl URL-agnostic dedup mechanism): HTTP headers
    only, NO payload block, with ``WARC-Payload-Digest`` (sha1 hex —
    labelled per spec; Common Crawl uses base32, hex round-trips exactly
    through Spark's built-in sha1) and ``WARC-Refers-To*`` headers naming
    the original record.

    NULL tolerance (the reader legitimately produces these): a missing
    warc_ts becomes the epoch, a missing status is written as ``0`` —
    round-tripping back to 0, an honest unknown — and a missing
    content_type as an empty header."""
    n = 0
    for rec in records:
        ts_s = _fmt_ts(rec.get("warc_ts"))
        status = rec.get("status")
        status = 0 if status is None else int(status)
        if rec.get("is_revisit"):
            http = (f"HTTP/1.1 {status} \r\n"
                    f"Content-Type: {rec.get('content_type') or ''}\r\n\r\n"
                    ).encode("utf-8")
            ref_ts = _fmt_ts(rec.get("orig_ts"))
            head = ("WARC/1.0\r\n"
                    "WARC-Type: revisit\r\n"
                    f"WARC-Target-URI: {rec['url']}\r\n"
                    f"WARC-Date: {ts_s}\r\n"
                    f"WARC-Record-ID: {_record_id(rec['url'], ts_s)}\r\n"
                    f"WARC-Profile: {REVISIT_PROFILE}\r\n"
                    f"WARC-Payload-Digest: "
                    f"sha1:{rec.get('payload_digest') or ''}\r\n"
                    f"WARC-Refers-To: "
                    f"{_record_id(rec['orig_url'], ref_ts)}\r\n"
                    f"WARC-Refers-To-Target-URI: {rec['orig_url']}\r\n"
                    f"WARC-Refers-To-Date: {ref_ts}\r\n"
                    "Content-Type: application/http; msgtype=response\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
            raw = head + http + _CRLF2
            if compress:
                gz = io.BytesIO()
                with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
                    g.write(raw)
                raw = gz.getvalue()
            f.write(raw)
            n += 1
            continue
        payload = bytes(rec.get("html") or b"")
        http = (f"HTTP/1.1 {status} \r\n"
                f"Content-Type: {rec.get('content_type') or ''}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode("utf-8") + payload
        head = ("WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {rec['url']}\r\n"
                f"WARC-Date: {ts_s}\r\n"
                f"WARC-Record-ID: {_record_id(rec['url'], ts_s)}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
        raw = head + http + _CRLF2
        if compress:
            gz = io.BytesIO()
            # mtime pinned for byte-determinism across runs
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
                g.write(raw)
            raw = gz.getvalue()
        f.write(raw)
        n += 1
    return n


def write_warc(records, path: str, compress: bool | None = None) -> int:
    """Write ``response`` records to one WARC file; returns record count.

    ``records``: iterable of dicts with keys url, warc_ts (datetime),
    status, content_type, html (bytes). ``compress`` defaults from the
    filename (``.gz``); gzip output is one member per record, the Common
    Crawl layout. Deterministic: record ids derive from (url, ts); no
    wall-clock or RNG.
    """
    if compress is None:
        compress = path.endswith(".gz")
    with open(path, "wb") as f:
        return _write_records(f, records, compress)


def write_warc_segments(records, outdir: str, n_segments: int = 4,
                        compress: bool = True) -> list[str]:
    """Shard records across ``n_segments`` WARC files (hash of url) — the
    many-files layout read_warc parallelizes over."""
    os.makedirs(outdir, exist_ok=True)
    buckets: list[list] = [[] for _ in range(n_segments)]
    for rec in records:
        b = int(hashlib.md5(rec["url"].encode()).hexdigest()[:8], 16) \
            % n_segments
        buckets[b].append(rec)
    ext = ".warc.gz" if compress else ".warc"
    paths = []
    for i, bucket in enumerate(buckets):
        p = os.path.join(outdir, f"segment-{i:05d}{ext}")
        write_warc(bucket, p, compress=compress)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# Spark sink (distributed writer)
# ---------------------------------------------------------------------------

def mark_revisits(df: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  html_col: str = "html") -> DataFrame:
    """Corpus-wide identical-payload-digest election: per sha1(html), the
    earliest (warc_ts, url) row is the original; every other row is marked
    ``is_revisit`` with ``orig_url``/``orig_ts`` pointing at it — the
    input for WARC revisit records (Common Crawl's URL-agnostic content
    dedup).

    Plan shape: the election aggregates a NARROW (digest, ts, url)
    projection (struct-min, map-side combined — a boilerplate payload
    shared by 10^9 urls is one agg group), then one equi-join attaches the
    original back on the digest. The html column rides through that single
    join; pre-bucketing the corpus by the digest makes it co-located. For
    a zero-shuffle variant scoped to each output segment (exactly a
    Common Crawl writer's behavior), use ``write_warc_df(...,
    dedup_revisits=True)`` instead, which dedups inside each partition
    writer with a local digest dict.
    """
    d = df.withColumn(
        "payload_digest",
        F.sha1(F.coalesce(F.col(html_col), F.lit(b""))))
    orig = (d.groupBy("payload_digest")
            .agg(F.min(F.struct(
                F.coalesce(F.col(ts_col),
                           F.lit("1970-01-01").cast("timestamp"))
                 .alias("ts"),
                F.col(url_col).alias("u"))).alias("o"))
            .select("payload_digest",
                    F.col("o.u").alias("orig_url"),
                    F.col("o.ts").alias("orig_ts")))
    out = d.join(orig, "payload_digest")
    return out.withColumn(
        "is_revisit",
        (F.col(url_col) != F.col("orig_url"))
        | (F.coalesce(F.col(ts_col), F.lit("1970-01-01").cast("timestamp"))
           != F.col("orig_ts")))


def write_warc_df(df: DataFrame, outdir: str,
                  compress: bool = True,
                  dedup_revisits: bool = False) -> DataFrame:
    """Distributed WARC sink: write ``(url, warc_ts, status, content_type,
    html)`` rows as one WARC segment per partition and return the manifest
    (``warc_file, n_records, n_bytes`` — one row per non-empty partition).

    The inverse of :func:`read_warc` — archives a crawl round (or a whole
    corpus table) in Common Crawl's own container. Executors write their
    own partition locally and never shuffle the html payloads; file names
    come from the partition id, so the layout is deterministic under a
    deterministic upstream partitioning (e.g. ``repartition(n, "url")``).
    ``outdir`` must be a path every executor can reach (local-mode dir,
    NFS, or a fuse-mounted object store) — the same contract as any
    foreachPartition-style sink.

    Revisit dedup (Common Crawl's identical-payload-digest mechanism):
    with ``dedup_revisits=True`` each segment writer keeps a local
    sha1->(url, ts) dict and writes every repeated payload as a WARC
    ``revisit`` record (headers only, no body) referring to the first
    occurrence in ITS OWN segment — zero shuffle, the per-writer scope a
    real Common Crawl writer has. For exact corpus-wide election, run
    :func:`mark_revisits` on ``df`` first and pass the result here with
    ``dedup_revisits=False``: the marked columns (is_revisit,
    payload_digest, orig_url, orig_ts) are honored when present.
    """
    os.makedirs(outdir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = ["url", "warc_ts", "status", "content_type", "html"]
    marked = not dedup_revisits and "is_revisit" in df.columns
    if marked:
        cols += ["is_revisit", "payload_digest", "orig_url", "orig_ts"]
    out_schema = T.StructType([
        T.StructField("warc_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def gen(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        name = f"segment-{pid:05d}{ext}"
        path = os.path.join(outdir, name)
        # dot-prefixed scratch name: Spark's file listings (binaryFile
        # included) skip hidden files, so a .part orphaned by a killed task
        # can never be re-ingested as duplicate records by read_warc
        part = os.path.join(outdir, f".{name}.part")
        n = 0
        seen_digests: dict = {}

        def to_rec(r):
            rec = {"url": r.url,
                   "warc_ts": None if pd.isna(r.warc_ts)
                   else r.warc_ts.to_pydatetime(),
                   "status": None if pd.isna(r.status)
                   else int(r.status),
                   "content_type": r.content_type,
                   "html": bytes(r.html) if r.html is not None
                   else b""}
            if marked and r.is_revisit:
                rec.update(
                    is_revisit=True,
                    payload_digest=r.payload_digest,
                    orig_url=r.orig_url,
                    orig_ts=None if pd.isna(r.orig_ts)
                    else r.orig_ts.to_pydatetime())
            elif dedup_revisits:
                dg = hashlib.sha1(rec["html"]).hexdigest()
                first = seen_digests.get(dg)
                if first is None:
                    seen_digests[dg] = (rec["url"], rec["warc_ts"])
                else:
                    rec.update(is_revisit=True, payload_digest=dg,
                               orig_url=first[0], orig_ts=first[1])
            return rec

        with open(part, "wb") as f:
            for pdf in batches:
                n += _write_records(
                    f, (to_rec(r) for r in pdf.itertuples(index=False)),
                    compress)
        if n == 0:
            os.unlink(part)
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        os.replace(part, path)   # atomic publish per partition
        yield pd.DataFrame([{"warc_file": name,
                             "n_records": n,
                             "n_bytes": os.path.getsize(path)}])

    return df.select(*cols).mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# WET sidecar (text-conversion archives — Common Crawl's *.warc.wet.gz)
# ---------------------------------------------------------------------------

def _write_wet_records(f, records, compress: bool) -> int:
    """Stream ``conversion`` records: payload is the extracted UTF-8 text,
    ``WARC-Refers-To`` points at the response record id the same (url, ts)
    would get in the paired WARC segment — the Common Crawl WET linkage."""
    n = 0
    for rec in records:
        ts_s = _fmt_ts(rec.get("warc_ts"))
        payload = (rec.get("text") or "").encode("utf-8")
        head = ("WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {rec['url']}\r\n"
                f"WARC-Date: {ts_s}\r\n"
                f"WARC-Record-ID: {_record_id(rec['url'], ts_s + ':wet')}\r\n"
                f"WARC-Refers-To: {_record_id(rec['url'], ts_s)}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
        raw = head + payload + _CRLF2
        if compress:
            gz = io.BytesIO()
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
                g.write(raw)
            raw = gz.getvalue()
        f.write(raw)
        n += 1
    return n


WET_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
    T.StructField("wet_file", T.StringType()),
])


def read_wet(spark, path: str) -> DataFrame:
    """Read WET segments into ``(url, warc_ts, text, wet_file)`` — one task
    per file, no shuffle, same tolerance contract as read_warc."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def gen(batches):
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in iter_warc_records(bytes(blob),
                                             types=("conversion",)):
                    rows.append({
                        "url": rec["url"], "warc_ts": rec["warc_ts"],
                        "text": rec["html"].decode("utf-8",
                                                   errors="replace"),
                        "wet_file": os.path.basename(fpath)})
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  WET_SCHEMA.fields])

    return files.mapInPandas(gen, schema=WET_SCHEMA)


def write_wet_df(df: DataFrame, outdir: str,
                 compress: bool = True) -> DataFrame:
    """Distributed WET sink: ``(url, warc_ts, text)`` rows -> one
    text-conversion segment per partition + manifest rows, with the same
    atomic ``.part`` publish discipline as write_warc_df. Pairs with the
    corpus table's extracted ``text`` column (the T5 byte-identical text),
    so a crawl can ship WARC + WET + CDX exactly like Common Crawl."""
    os.makedirs(outdir, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    out_schema = T.StructType([
        T.StructField("wet_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def gen(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        name = f"segment-{pid:05d}{ext}"
        path = os.path.join(outdir, name)
        part = os.path.join(outdir, f".{name}.part")
        n = 0
        with open(part, "wb") as f:
            for pdf in batches:
                recs = ({"url": r.url,
                         "warc_ts": None if pd.isna(r.warc_ts)
                         else r.warc_ts.to_pydatetime(),
                         "text": r.text}
                        for r in pdf.itertuples(index=False))
                n += _write_wet_records(f, recs, compress)
        if n == 0:
            os.unlink(part)
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        os.replace(part, path)
        yield pd.DataFrame([{"wet_file": name, "n_records": n,
                             "n_bytes": os.path.getsize(path)}])

    return df.select("url", "warc_ts", "text").mapInPandas(
        gen, schema=out_schema)


# ---------------------------------------------------------------------------
# WAT sidecar (metadata archives — Common Crawl's *.warc.wat.gz)
# ---------------------------------------------------------------------------

def _wat_envelope(rec, ts_s: str) -> bytes:
    """Common-Crawl-shaped WAT JSON for one response capture: the envelope
    mirrors the WARC headers the paired response record carries, the
    payload metadata carries the HTTP status/Content-Type and the
    HTML-Metadata block (outlinks + title) — the subset of CC's WAT
    schema a link-graph / anchor-text consumer actually reads. Keys are
    sorted so the bytes are deterministic. Link entries carry only the
    url: the extractor returns resolved hrefs without element provenance,
    so CC's per-element ``path`` labels (A@/href vs AREA@/href vs
    LINK@/rel=canonical) are a documented gap. An absent status is
    written as 0 — the same honest unknown the WARC writer's HTTP status
    line uses, so the quad never contradicts itself."""
    import json

    html_meta: dict = {"Links": [{"url": u}
                                 for u in (rec.get("links") or [])]}
    if rec.get("title"):
        html_meta["Head"] = {"Title": rec["title"]}
    headers = {}
    if rec.get("content_type"):
        headers["Content-Type"] = rec["content_type"]
    env = {"Envelope": {
        "Format": "WARC",
        "WARC-Header-Metadata": {
            "WARC-Type": "response",
            "WARC-Target-URI": rec["url"],
            "WARC-Date": ts_s,
            "WARC-Record-ID": _record_id(rec["url"], ts_s)},
        "Payload-Metadata": {
            "Actual-Content-Type": "application/http; msgtype=response",
            "HTTP-Response-Metadata": {
                "Response-Message": {"Status": 0 if rec.get("status") is None
                                     else int(rec["status"])},
                "Headers": headers,
                "HTML-Metadata": html_meta}}}}
    return json.dumps(env, sort_keys=True, ensure_ascii=False).encode("utf-8")


def _write_wat_records(f, records, compress: bool) -> int:
    """Stream ``metadata`` records: payload is the WAT JSON envelope,
    ``WARC-Refers-To`` points at the paired response record id — the same
    linkage discipline as the WET sidecar."""
    n = 0
    for rec in records:
        ts_s = _fmt_ts(rec.get("warc_ts"))
        payload = _wat_envelope(rec, ts_s)
        head = ("WARC/1.0\r\n"
                "WARC-Type: metadata\r\n"
                f"WARC-Target-URI: {rec['url']}\r\n"
                f"WARC-Date: {ts_s}\r\n"
                f"WARC-Record-ID: {_record_id(rec['url'], ts_s + ':wat')}\r\n"
                f"WARC-Refers-To: {_record_id(rec['url'], ts_s)}\r\n"
                "Content-Type: application/json\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
        raw = head + payload + _CRLF2
        if compress:
            gz = io.BytesIO()
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
                g.write(raw)
            raw = gz.getvalue()
        f.write(raw)
        n += 1
    return n


WAT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("wat_file", T.StringType()),
])


def read_wat(spark, path: str) -> DataFrame:
    """Read WAT segments into ``(url, warc_ts, status, content_type, title,
    links, wat_file)`` — one task per file, no shuffle, same tolerance
    contract as read_warc (a record whose JSON doesn't parse is skipped,
    not fatal)."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def gen(batches):
        import json
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in iter_warc_records(bytes(blob),
                                             types=("metadata",)):
                    # the WHOLE record parse is tolerant: foreign WAT
                    # files vary in envelope shape (missing keys,
                    # non-dict members, Links entries without 'url') —
                    # a bad record is skipped, never a task failure
                    try:
                        env = json.loads(rec["html"])["Envelope"]
                        pm = env["Payload-Metadata"]["HTTP-Response-Metadata"]
                        hm = pm.get("HTML-Metadata") or {}
                        head = hm.get("Head") or {}
                        rows.append({
                            "url": rec["url"], "warc_ts": rec["warc_ts"],
                            "status": (pm.get("Response-Message") or {})
                                       .get("Status"),
                            "content_type": (pm.get("Headers") or {})
                                             .get("Content-Type"),
                            "title": head.get("Title")
                            if isinstance(head, dict) else None,
                            "links": [l["url"]
                                      for l in (hm.get("Links") or [])
                                      if isinstance(l, dict) and "url" in l],
                            "wat_file": os.path.basename(fpath)})
                    except (ValueError, KeyError, TypeError,
                            AttributeError):
                        continue
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  WAT_SCHEMA.fields])

    return files.mapInPandas(gen, schema=WAT_SCHEMA)


def write_wat_df(df: DataFrame, outdir: str,
                 compress: bool = True) -> DataFrame:
    """Distributed WAT sink: ``(url, warc_ts, status, content_type, title,
    links)`` rows -> one metadata segment per partition + manifest rows,
    same atomic ``.part`` publish discipline as the WARC/WET writers.
    Completes the Common Crawl artifact quad (WARC + WAT + WET + CDX)."""
    os.makedirs(outdir, exist_ok=True)
    ext = ".warc.wat.gz" if compress else ".warc.wat"
    out_schema = T.StructType([
        T.StructField("wat_file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def gen(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        name = f"segment-{pid:05d}{ext}"
        path = os.path.join(outdir, name)
        part = os.path.join(outdir, f".{name}.part")
        n = 0
        with open(part, "wb") as f:
            for pdf in batches:
                recs = ({"url": r.url,
                         "warc_ts": None if pd.isna(r.warc_ts)
                         else r.warc_ts.to_pydatetime(),
                         "status": None if pd.isna(r.status) else int(r.status),
                         "content_type": None if pd.isna(r.content_type)
                         else r.content_type,
                         "title": None if pd.isna(r.title) else r.title,
                         "links": list(r.links)
                         if r.links is not None else []}
                        for r in pdf.itertuples(index=False))
                n += _write_wat_records(f, recs, compress)
        if n == 0:
            os.unlink(part)
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        os.replace(part, path)
        yield pd.DataFrame([{"wat_file": name, "n_records": n,
                             "n_bytes": os.path.getsize(path)}])

    return df.select("url", "warc_ts", "status", "content_type", "title",
                     "links").mapInPandas(gen, schema=out_schema)
