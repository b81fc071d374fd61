"""Probabilistic URL-seen sidecars: per-bucket Bloom filters + a cuckoo
filter with deletion support.

Role (north_star): the exact int64-hash anti-join is the source of truth;
the Bloom sidecar is a *pre-filter* that drops the bulk of already-seen
candidates before they reach the shuffle, cutting anti-join exchange volume
at 10^10-URL scale. Because Bloom false positives only send a few extra rows
into the exact join, exactness is preserved. (The reference's
BloomFilterCrawledUrlRepository instead drops on FP — that lossy mode exists
behind ``lossy=True`` for behavioral parity.)

Design:
- one Bloom blob per domain-hash bucket (``pmod(xxhash64(domain), B)``), so
  blob size stays bounded and builds parallelize: built with a grouped
  ``applyInPandas`` (numpy bitset per bucket), stored as a binary column.
- sizing per the reference's formulas (BloomFilter.cs:178-192):
  m = n·|ln p|/ln(2)^2 bits, k = round(ln(2)·m/n) hashes.
- membership hashing: Dillinger–Manolios double hashing h1 + i·h2 mod m
  (BloomFilter.cs:282-286) over the two halves of md5(url) — stable
  everywhere, no process-randomized .NET GetHashCode.
- the cuckoo filter (4-way buckets, 16-bit fingerprints, partial-cuckoo
  kicking) supports ``delete`` — used when a URL is evicted from the seen
  set (IsUriRecrawlingEnabled / scheduled recrawl), which Bloom cannot do.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


# --------------------------------------------------------------------------
# Bloom filter (numpy bitset, reference sizing formulas)
# --------------------------------------------------------------------------

def best_m_k(capacity: int, error_rate: float) -> tuple[int, int]:
    """BloomFilter.cs:178-192 — BestM / BestK."""
    m = int(math.ceil(capacity * abs(math.log(error_rate))
                      / (math.log(2) ** 2)))
    k = int(round(math.log(2.0) * m / capacity))
    return max(m, 8), max(k, 1)


def _h1_h2(key: bytes) -> tuple[int, int]:
    d = hashlib.md5(key).digest()
    return (int.from_bytes(d[:8], "little"),
            int.from_bytes(d[8:], "little") | 1)  # odd => full cycle


class BloomFilter:
    """Bitset Bloom filter; double hashing h1 + i*h2 mod m."""

    def __init__(self, capacity: int, error_rate: float = 0.001,
                 bits: np.ndarray | None = None) -> None:
        self.m, self.k = best_m_k(capacity, error_rate)
        self.capacity = capacity
        self.error_rate = error_rate
        if bits is None:
            self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        else:
            self.bits = bits

    def _positions(self, key: bytes) -> list[int]:
        h1, h2 = _h1_h2(key)
        return [(h1 + i * h2) % self.m for i in range(self.k)]

    def add(self, key: bytes) -> None:
        for pos in self._positions(key):
            self.bits[pos >> 3] |= 1 << (pos & 7)

    def __contains__(self, key: bytes) -> bool:
        return all(self.bits[pos >> 3] & (1 << (pos & 7))
                   for pos in self._positions(key))

    def add_many(self, keys) -> None:
        for key in keys:
            self.add(key)

    def truthiness(self) -> float:
        """Fraction of set bits (BloomFilter.cs:127-133 diagnostic, A3)."""
        return float(np.unpackbits(self.bits).sum()) / self.m

    def to_bytes(self) -> bytes:
        header = self.m.to_bytes(8, "little") + self.k.to_bytes(4, "little")
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        m = int.from_bytes(blob[:8], "little")
        k = int.from_bytes(blob[8:12], "little")
        obj = cls.__new__(cls)
        obj.m, obj.k = m, k
        obj.capacity, obj.error_rate = 0, 0.0
        obj.bits = np.frombuffer(blob[12:], dtype=np.uint8).copy()
        return obj


def _key_of(url_hash: int) -> bytes:
    return int(url_hash).to_bytes(8, "little", signed=True)


BLOOM_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("n_keys", T.LongType()),
    T.StructField("blob", T.BinaryType()),
])


def build_bloom_sidecar(seen: DataFrame, buckets: int = 32,
                        error_rate: float = 0.001,
                        min_capacity: int = 100_000) -> DataFrame:
    """One Bloom blob per domain-hash bucket, built with grouped
    applyInPandas (the reference capacity default is 2,000,001 @ 0.1% —
    BloomFilterCrawledUrlRepository.cs:18; we size per-bucket)."""
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        bf = BloomFilter(max(n * 2, min_capacity), error_rate)
        for h in pdf["url_hash"]:
            bf.add(_key_of(h))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "n_keys": [n], "blob": [bf.to_bytes()]})

    with_bucket = seen.withColumn(
        "bucket", F.pmod(F.xxhash64("url_hash"), F.lit(buckets)).cast("int"))
    return with_bucket.groupBy("bucket").applyInPandas(build, BLOOM_SCHEMA)


def merge_bloom_sidecar(sidecar: DataFrame, new_hashes: DataFrame,
                        buckets: int = 32, error_rate: float = 0.001,
                        min_capacity: int = 100_000,
                        hash_col: str = "url_hash") -> DataFrame:
    """Incremental sidecar update: only buckets receiving new keys touch
    their bitsets; untouched blobs pass through unchanged. This replaces the
    per-round full-seen rebuild — per-round cost is O(new keys + B blobs),
    independent of the total seen-set size.

    Saturation policy: a blob whose set-bit fraction exceeds 0.5 (its design
    load at build time) is DROPPED rather than grown — the bucket then
    reports maybe_seen=True for everything and the exact anti-join takes
    over (exactness preserved, prefilter effectiveness degrades until the
    next full rebuild, which production would align with Iceberg snapshot
    compaction)."""
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        # sidecar rows always carry n_keys (build/merge emit it); new-hash
        # rows never do. Discriminating on blob alone would misread a
        # SATURATED sidecar row (blob=None) as a new-hash row.
        is_sidecar = pdf["n_keys"].notna()
        side = pdf[is_sidecar]
        keys = pdf.loc[~is_sidecar, "new_hash"].dropna()
        if len(side):
            n = int(side["n_keys"].iloc[0]) + len(keys)
            prev_blob = side["blob"].iloc[0]
            if prev_blob is None:
                # already saturated: stays always-maybe (the exact anti-join
                # owns the bucket); never rebuilt from a partial key set
                return pd.DataFrame({"bucket": [bucket], "n_keys": [n],
                                     "blob": [None]})
            bf = BloomFilter.from_bytes(bytes(prev_blob))
        else:
            bf = BloomFilter(max(len(keys) * 2, min_capacity), error_rate)
            n = len(keys)
        for h in keys:
            bf.add(_key_of(int(h)))
        if bf.truthiness() > 0.5:   # saturated: degrade to always-maybe
            return pd.DataFrame({"bucket": [bucket], "n_keys": [n],
                                 "blob": [None]})
        return pd.DataFrame({"bucket": [bucket], "n_keys": [n],
                             "blob": [bf.to_bytes()]})

    # new_hash travels as STRING: the union mixes it with the sidecar rows'
    # NULLs, and Arrow->pandas turns a nullable int64 column into float64 —
    # silently rounding 64-bit hashes (>2^53) before they reach the Bloom,
    # i.e. unrecoverable false NEGATIVES on later probes of the exact hash
    nb = (new_hashes.select(F.col(hash_col))
          .withColumn("bucket",
                      F.pmod(F.xxhash64(hash_col), F.lit(buckets)).cast("int"))
          .select("bucket", F.col(hash_col).cast("string").alias("new_hash"),
                  F.lit(None).cast("long").alias("n_keys"),
                  F.lit(None).cast("binary").alias("blob")))
    old = sidecar.select("bucket",
                         F.lit(None).cast("string").alias("new_hash"),
                         "n_keys", "blob")
    return old.unionByName(nb).groupBy("bucket").applyInPandas(
        merge, BLOOM_SCHEMA)


def bloom_prefilter(candidates: DataFrame, sidecar, spark=None,
                    hash_col: str = "url_hash", buckets: int = 32,
                    lossy: bool = False) -> DataFrame:
    """Filter candidates through the Bloom sidecar.

    ``sidecar`` is either a (bucket, n_keys, blob) DataFrame or a driver
    dict {bucket: blob_bytes | None}. Blobs ship to executors via
    ``sc.broadcast`` (deserialized once per executor, NOT pickled into every
    task closure). A missing or saturated (None) blob reports
    maybe_seen=True — the exact anti-join decides.

    lossy=False (default): keep rows NOT in the filter (definitely-new) and
    rows the filter claims seen — flagged ``maybe_seen`` — for the exact
    anti-join; exactness preserved, shuffle volume cut.
    lossy=True: reference BloomFilterCrawledUrlRepository semantics —
    FP-positive rows are dropped outright (accepted URL loss)."""
    if isinstance(sidecar, DataFrame):
        blobs = {int(r["bucket"]): (bytes(r["blob"])
                                    if r["blob"] is not None else None)
                 for r in sidecar.collect()}
        if spark is None:
            spark = sidecar.sparkSession
    else:
        blobs = sidecar
    bc = spark.sparkContext.broadcast(blobs)

    from pyspark.sql.functions import pandas_udf
    cache: dict = {}

    @pandas_udf(T.BooleanType())
    def maybe_seen_udf(hashes: pd.Series, bucket: pd.Series) -> pd.Series:
        local = cache.get("filters")
        if local is None:
            local = {b: (BloomFilter.from_bytes(blob)
                         if blob is not None else None)
                     for b, blob in bc.value.items()}
            cache["filters"] = local
        out = []
        for h, b in zip(hashes, bucket):
            b = int(b)
            if b not in local:
                out.append(False)          # bucket never seeded: nothing seen
            else:
                bf = local[b]
                # saturated bucket (None): defer to the exact join
                out.append(bf is None or _key_of(int(h)) in bf)
        return pd.Series(out)

    out = candidates.withColumn(
        "__bucket", F.pmod(F.xxhash64(hash_col), F.lit(buckets)).cast("int"))
    out = out.withColumn("maybe_seen",
                         maybe_seen_udf(F.col(hash_col), F.col("__bucket")))
    out = out.drop("__bucket")
    if lossy:
        return out.filter(~F.col("maybe_seen")).drop("maybe_seen")
    return out


def sidecar_blob_bytes(sidecar: dict) -> int:
    """Total blob payload of a driver-side sidecar dict
    {bucket: (n_keys, blob|None)} — the broadcast-vs-bucketed mode gate."""
    return sum(len(blob) for _n, blob in sidecar.values() if blob is not None)


def bloom_prefilter_bucketed(candidates: DataFrame, sidecar_path: str,
                             hash_col: str = "url_hash", buckets: int = 32,
                             lossy: bool = False) -> DataFrame:
    """Bucket-aligned sidecar probe — the 10^10-seen-URL path.

    The broadcast probe (``bloom_prefilter``) collects every blob through the
    driver and ships the full set to every executor; at the tens-of-GB blob
    volume a 10^10-key seen set needs for a useful FP rate, both driver
    memory and the broadcast break (VERDICT r02 item 3). Here the blobs stay
    a bucketed state-store table: candidates repartition on the SAME bucket
    key the blobs are partitioned by, and a ``mapInArrow`` probe lazily reads
    only the blob rows for buckets present in its partition straight from
    shared storage — per task that is O(blobs/partitions) bytes, the driver
    never touches a blob, and nothing broadcasts.

    mapInArrow (not pandas) keeps int64 hash columns exact: the pandas
    round-trip turns nullable int64 into float64 and silently rounds hashes
    above 2^53 (same hazard documented at merge_bloom_sidecar).

    Admission semantics are identical to ``bloom_prefilter``: absent bucket
    -> definitely new; saturated blob (None) -> maybe_seen, the exact
    anti-join decides; otherwise the reference md5 double-hash membership
    probe. The extra candidate shuffle (repartition by bucket) is the price
    of co-location — candidates are one round's links, orders of magnitude
    below the seen table this prefilter protects. Probe parallelism equals
    ``buckets`` (one partition per bucket): at the scale that activates
    this path, raise ``cfg.state_buckets`` (the same knob that bounds
    per-bucket blob size) — e.g. 4096 buckets at 10^10 keys gives both
    ~task-sized blobs and full cluster parallelism."""
    import pyarrow as pa

    withb = candidates.withColumn(
        "__bucket", F.pmod(F.xxhash64(hash_col), F.lit(buckets)).cast("int"))
    out_schema = T.StructType(
        withb.schema.fields + [T.StructField("maybe_seen", T.BooleanType())])
    rep = withb.repartition(buckets, "__bucket")

    def probe(batches):
        import pyarrow.parquet as pq
        cache: dict = {}
        _ABSENT = object()

        def get(bucket: int):
            if bucket not in cache:
                tbl = pq.read_table(sidecar_path,
                                    filters=[("bucket", "=", bucket)],
                                    columns=["bucket", "blob"])
                if tbl.num_rows == 0:
                    cache[bucket] = _ABSENT
                else:
                    blob = tbl.column("blob")[0].as_py()
                    cache[bucket] = (BloomFilter.from_bytes(bytes(blob))
                                     if blob is not None else None)
            return cache[bucket]

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            bcol = batch.column("__bucket").to_numpy(zero_copy_only=False)
            hacol = batch.column(batch.schema.get_field_index(hash_col))
            # a null in an Arrow int64 array makes to_numpy fall back to
            # float64, silently rounding hashes above 2^53 — refuse instead
            # (frontier hashes are never null; a null here is a caller bug)
            if hacol.null_count:
                raise ValueError(
                    f"bloom_prefilter_bucketed: NULL in {hash_col} — "
                    "int64 hashes must be non-null to stay exact")
            hcol = hacol.to_numpy(zero_copy_only=False)
            out = np.zeros(n, dtype=bool)
            for b in np.unique(bcol):
                entry = get(int(b))
                idx = np.nonzero(bcol == b)[0]
                if entry is _ABSENT:
                    continue                       # bucket never seeded
                if entry is None:                  # saturated: exact join owns
                    out[idx] = True
                else:
                    for i in idx:
                        out[i] = _key_of(int(hcol[i])) in entry
            yield batch.append_column("maybe_seen", pa.array(out))

    res = rep.mapInArrow(probe, out_schema).drop("__bucket")
    if lossy:
        return res.filter(~F.col("maybe_seen")).drop("maybe_seen")
    return res


# --------------------------------------------------------------------------
# Whole-queue URL bloom (the fetch-join scan pushdown)
# --------------------------------------------------------------------------

def build_url_bloom(df: DataFrame, url_col: str = "url",
                    capacity: int = 1_000_000,
                    error_rate: float = 0.01) -> tuple[int, int, bytes]:
    """Distributed Bloom build over a url column: each partition builds a
    partial bitset with the SAME (m, k) (mapInPandas), the driver ORs the
    ~m/8-byte partials. Returns (m, k, bits). Unlike a broadcast hash
    relation of the queue, the result is O(m) bytes regardless of queue
    row count — this is what lets a 10^10-row frontier push its fetch set
    into the corpus scan."""
    m, k = best_m_k(max(capacity, 1024), error_rate)

    def build(batches):
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        for pdf in batches:
            for u in pdf[url_col]:
                if u is None:
                    continue
                h1, h2 = _h1_h2(u.encode("utf-8"))
                for i in range(k):
                    pos = (h1 + i * h2) % m
                    bits[pos >> 3] |= 1 << (pos & 7)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(url_col).mapInPandas(build, "bits binary").collect()
    out = np.zeros((m + 7) // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
    return m, k, out.tobytes()


def _mix64(h: "np.ndarray") -> "np.ndarray":
    """splitmix64 finalizer — second independent hash stream from the first."""
    z = (h + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def build_hash_bloom(df: DataFrame, hash_col: str,
                     capacity: int = 1_000_000,
                     error_rate: float = 0.01) -> tuple[int, int, bytes]:
    """Fully vectorized variant of build_url_bloom over a PRE-HASHED int64
    column (JVM xxhash64): numpy double hashing h1 + i*mix(h1), no per-row
    python. Partition partials OR on the driver; O(m) bytes total."""
    m, k = best_m_k(max(capacity, 1024), error_rate)

    def build(batches):
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        for pdf in batches:
            h1 = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
            if not len(h1):
                continue
            h2 = _mix64(h1) | np.uint64(1)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                                 (np.uint64(1) << (pos & np.uint64(7)))
                                 .astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.mapInPandas(build, "bits binary").collect()
    out = np.zeros((m + 7) // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
    return m, k, out.tobytes()


def make_hash_bloom_member_udf(spark, m: int, k: int, bits: bytes):
    """Vectorized probe over a pre-hashed int64 column."""
    bc = spark.sparkContext.broadcast(bits)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BooleanType())
    def member(hashes: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = hashes.to_numpy(dtype=np.int64).astype(np.uint64)
        if not len(h1):
            return pd.Series([], dtype=bool)
        h2 = _mix64(h1) | np.uint64(1)
        hit = np.ones(len(h1), dtype=bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (byte & (np.uint64(1) << (pos & np.uint64(7)))
                    .astype(np.uint8)) != 0
        return pd.Series(hit)

    return member


def make_url_bloom_member_udf(spark, m: int, k: int, bits: bytes):
    """Vectorized membership probe for the scan-side filter (false positives
    only admit extra rows into the subsequent exact join)."""
    bc = spark.sparkContext.broadcast(bits)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BooleanType())
    def member(urls: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for u in urls:
            if u is None:
                out.append(False)
                continue
            h1, h2 = _h1_h2(u.encode("utf-8"))
            hit = True
            for i in range(k):
                pos = (h1 + i * h2) % m
                if not arr[pos >> 3] & (1 << (pos & 7)):
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out)

    return member


# --------------------------------------------------------------------------
# Cuckoo filter (deletion-capable sidecar)
# --------------------------------------------------------------------------

class CuckooFilter:
    """4-way-bucket cuckoo filter with 16-bit fingerprints.

    Supports delete (what Bloom lacks) — used for recrawl-eviction from the
    seen set. Partial-key cuckoo hashing: alt_bucket = bucket XOR hash(fp)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int) -> None:
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.3:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0

    def _fp_and_bucket(self, key: bytes) -> tuple[int, int]:
        d = hashlib.md5(key).digest()
        fp = (int.from_bytes(d[:2], "little") % 65535) + 1  # never 0
        bucket = int.from_bytes(d[2:10], "little") % self.n_buckets
        return fp, bucket

    def _alt(self, bucket: int, fp: int) -> int:
        h = int.from_bytes(hashlib.md5(fp.to_bytes(2, "little")).digest()[:8],
                           "little")
        return (bucket ^ h) % self.n_buckets

    def add(self, key: bytes) -> bool:
        fp, b1 = self._fp_and_bucket(key)
        b2 = self._alt(b1, fp)
        for b in (b1, b2):
            row = self.table[b]
            free = np.where(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        # kick
        import random
        rng = random.Random(fp)  # deterministic per fingerprint
        b = rng.choice((b1, b2))
        for _ in range(self.MAX_KICKS):
            slot = rng.randrange(self.SLOTS)
            fp, self.table[b][slot] = int(self.table[b][slot]), fp
            b = self._alt(b, fp)
            row = self.table[b]
            free = np.where(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        return False  # table full

    def __contains__(self, key: bytes) -> bool:
        fp, b1 = self._fp_and_bucket(key)
        b2 = self._alt(b1, fp)
        return bool((self.table[b1] == fp).any() or (self.table[b2] == fp).any())

    def delete(self, key: bytes) -> bool:
        fp, b1 = self._fp_and_bucket(key)
        b2 = self._alt(b1, fp)
        for b in (b1, b2):
            idx = np.where(self.table[b] == fp)[0]
            if len(idx):
                self.table[b][idx[0]] = 0
                self.count -= 1
                return True
        return False

    def to_bytes(self) -> bytes:
        return self.n_buckets.to_bytes(8, "little") + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.n_buckets = int.from_bytes(blob[:8], "little")
        obj.table = np.frombuffer(blob[8:], dtype=np.uint16) \
            .reshape(obj.n_buckets, cls.SLOTS).copy()
        obj.count = int((obj.table != 0).sum())
        return obj


CUCKOO_SCHEMA = BLOOM_SCHEMA


def build_cuckoo_sidecar(seen: DataFrame, buckets: int = 32) -> DataFrame:
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(max(len(pdf), 1024))
        for h in pdf["url_hash"]:
            cf.add(_key_of(h))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "n_keys": [len(pdf)], "blob": [cf.to_bytes()]})

    with_bucket = seen.withColumn(
        "bucket", F.pmod(F.xxhash64("url_hash"), F.lit(buckets)).cast("int"))
    return with_bucket.groupBy("bucket").applyInPandas(build, CUCKOO_SCHEMA)


def _le32_mod_cols(key, m: int):
    """The four little-endian uint32 words of md5(key) reduced mod m, as
    column expressions — the relational form of _h1_h2: h1 = w0 + w1*2^32,
    h2 = (w2 | 1) + w3*2^32, both evaluated in modular arithmetic so no
    intermediate exceeds k*m (the raw uint64s would overflow a signed
    bigint). Shared by bloom_fpr_eval and its SQL oracle construction."""
    h = F.md5(key)

    def le_word(o):
        le = F.concat(F.substring(h, o + 7, 2), F.substring(h, o + 5, 2),
                      F.substring(h, o + 3, 2), F.substring(h, o + 1, 2))
        return F.conv(le, 16, 10).cast("long")

    w0, w1, w2, w3 = le_word(0), le_word(8), le_word(16), le_word(24)
    two32 = (1 << 32) % m
    h1m = ((w0 % m) + (w1 % m) * two32) % m
    # | 1 on the little-endian low byte = +1 when the low word is even
    w2or1 = w2 + F.when(w2 % 2 == 0, F.lit(1)).otherwise(F.lit(0))
    h2m = ((w2or1 % m) + (w3 % m) * two32) % m
    return h1m, h2m


def bloom_fpr_eval(inserted: DataFrame, probes: DataFrame,
                   key_col: str = "url", capacity: int = 400,
                   error_rate: float = 0.05) -> DataFrame:
    """Measure the ACTUAL false-positive rate of the reference Bloom
    filter construction (BloomFilter.cs BestM/BestK + md5 double hashing)
    against its configured target, as one relational plan — no bit array
    materializes: the filter's set bits ARE the distinct positions of the
    inserted keys, and a probe is positive iff every one of its k
    positions is set (a semi-join + count equality).

    Returns one row (m, k, n_inserted, n_probes, n_fp, fpr_millis).
    Probes are assumed disjoint from inserted keys (the caller picks
    them), so every positive probe is a false positive.

    This is the evaluation harness for T8 sizing: run it on a key sample
    before committing a capacity/error_rate pair for a 10^10-URL seen
    set — evaluate at a SCALED-DOWN capacity with the same error_rate
    (FPR depends on k and the load factor n/m, both preserved under
    proportional scaling), not at the production m itself: the modular
    products here are bounded by m^2, so m must stay under ~3·10^9 to
    fit int64 (guarded below). Plan: positions explode keys k-ways (k is
    small), one distinct, one broadcast-able semi-join (the set-bit
    dimension is <= m rows — KBs), one agg.
    """
    m, k = best_m_k(capacity, error_rate)
    if m > 3_000_000_000:
        raise ValueError(
            f"m={m} overflows the int64 modular arithmetic (m^2 bound); "
            "evaluate on a proportionally smaller capacity with the same "
            "error_rate — FPR depends only on k and the load factor")

    def positions(df, idc):
        h1m, h2m = _le32_mod_cols(F.col(key_col), m)
        return (df.select(F.col(key_col).alias(idc),
                          F.explode(F.array(*[
                              F.lit(i) for i in range(k)])).alias("i"),
                          h1m.alias("h1m"), h2m.alias("h2m"))
                .select(idc, ((F.col("h1m") + F.col("i") * F.col("h2m"))
                              % m).alias("pos"))
                .distinct())

    set_bits = positions(inserted, "__ik").select("pos").distinct()
    ppos = positions(probes, "__pk")
    per_probe = ppos.groupBy("__pk").agg(F.count("*").alias("npos"))
    hit = (ppos.join(F.broadcast(set_bits), "pos", "left_semi")
           .groupBy("__pk").agg(F.count("*").alias("nhit")))
    fp = (per_probe.join(hit, "__pk", "left")
          .filter(F.coalesce(F.col("nhit"), F.lit(0)) == F.col("npos"))
          .agg(F.count("*").alias("n_fp")))
    ni = inserted.agg(F.countDistinct(key_col).alias("n_inserted"))
    np_ = probes.agg(F.countDistinct(key_col).alias("n_probes"))
    return (ni.crossJoin(np_).crossJoin(fp)
            .select(F.lit(m).alias("m"), F.lit(k).alias("k"),
                    "n_inserted", "n_probes", "n_fp",
                    F.expr("cast((n_fp * 1000) DIV greatest(n_probes, 1L)"
                           " as int)").alias("fpr_millis")))
