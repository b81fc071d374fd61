"""Snapshot-per-round state store (Iceberg-shaped checkpointing).

The north_rule calls for Iceberg tables; this sandbox has no Iceberg runtime
jar, so the store implements the same contract over parquet directories with
an atomic commit manifest per round:

  <root>/<table>/round=<k>/*.parquet         (state tables: full snapshot)
  <root>/<table>/round=<k>/*.parquet         (event tables: per-round append)
  <root>/_commits/commit-<k>.json            (atomic rename; the round exists
                                              iff its manifest does)

Resume = read the highest committed manifest and load the snapshot paths it
names — a crawl killed mid-round leaves a dangling uncommitted directory that
is simply ignored, which is exactly Iceberg's snapshot-isolation behavior.
In production the writes become ``df.writeTo(tbl).overwritePartitions()`` /
``.append()`` and the manifest becomes the Iceberg snapshot tag ``round-k``;
nothing else in the engine changes.

State tables are written partitioned by a deterministic domain-hash bucket
(``pmod(xxhash64(domain), B)``) so the seen-set anti-join and the politeness
window shuffle-align across rounds.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

STATE_TABLES = ("frontier", "seen", "domain_counts", "domain_state",
                "root_domains", "bloom_sidecar")
EVENT_TABLES = ("crawled", "disallowed", "lineage", "metrics")


class StateStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # --- paths -----------------------------------------------------------

    def _table_path(self, name: str, round_: int) -> str:
        return os.path.join(self.root, name, f"round={round_}")

    def _commit_path(self, round_: int) -> str:
        return os.path.join(self.root, "_commits", f"commit-{round_:06d}.json")

    # --- write -----------------------------------------------------------

    def write_table(self, name: str, df: DataFrame, round_: int) -> str:
        path = self._table_path(name, round_)
        df.write.mode("overwrite").parquet(path)
        return path

    def write_pandas(self, name: str, pdf, round_: int) -> str:
        """Driver-side write for tiny tables (metrics/lineage) — same layout
        as write_table, no Spark job."""
        path = self._table_path(name, round_)
        os.makedirs(path, exist_ok=True)
        pdf.to_parquet(os.path.join(path, "part-0.parquet"), index=False,
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        return path

    def commit_round(self, round_: int, counters: dict) -> None:
        """Atomic: the round is visible iff the manifest rename completed."""
        manifest = {
            "round": round_,
            "counters": counters,
            "tables": {n: self._table_path(n, round_) for n in STATE_TABLES},
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_commits"))
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._commit_path(round_))

    # --- read ------------------------------------------------------------

    def latest_round(self) -> int | None:
        commits_dir = os.path.join(self.root, "_commits")
        rounds = [int(f[len("commit-"):-len(".json")])
                  for f in os.listdir(commits_dir)
                  if f.startswith("commit-") and f.endswith(".json")]
        return max(rounds) if rounds else None

    def read_manifest(self, round_: int) -> dict:
        with open(self._commit_path(round_)) as f:
            return json.load(f)

    def read_table(self, spark: SparkSession, name: str, round_: int) -> DataFrame:
        return spark.read.parquet(self._table_path(name, round_))

    def read_events(self, spark: SparkSession, name: str,
                    upto_round: int | None = None) -> DataFrame:
        """Union of all committed per-round event partitions.

        Raises a descriptive error on a store with no committed rounds or
        no partitions for ``name`` (instead of a TypeError on ``None + 1``
        / Spark's path-resolution crash on an empty parquet list — the
        event schemas are column-pruned per round, so there is no static
        schema to synthesize an empty frame from)."""
        last = self.latest_round() if upto_round is None else upto_round
        if last is None:
            raise ValueError(
                f"no committed rounds in {self.root!r} — nothing to read "
                f"for event table {name!r}")
        paths = [self._table_path(name, r) for r in range(last + 1)
                 if os.path.isdir(self._table_path(name, r))]
        if not paths:
            raise ValueError(
                f"event table {name!r} has no partitions through round "
                f"{last} in {self.root!r}")
        return spark.read.parquet(*paths)

    def drop_uncommitted(self) -> None:
        """GC dangling round dirs beyond the last commit (crash cleanup)."""
        last = self.latest_round()
        for name in STATE_TABLES + EVENT_TABLES:
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            for sub in os.listdir(tdir):
                if sub.startswith("round="):
                    r = int(sub.split("=")[1])
                    if last is None or r > last:
                        shutil.rmtree(os.path.join(tdir, sub))
