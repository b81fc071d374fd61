#!/usr/bin/env python
"""spark-submit entry point for one-shot corpus cleaning.

Runs the document-side decision cascade (script routing -> Gopher
quality -> soft-404 -> exact dedup, ``cleaning.quality_cascade``) and
optionally MinHash-LSH near-dup selection over a document table, writes
the kept documents as parquet, and prints ONE JSON summary line with
per-reason drop counts.

    spark-submit --py-files dist/abot_dotnet_core_spark.zip \\
        scripts/clean_corpus.py \\
        --input /data/docs --output /data/clean \\
        --near-dup --jaccard 0.2

Input formats:
  parquet (default)  a table with a text column; doc ids come from
                     --id-col if present, else from the url column via
                     the engine's T7 md5-prefix hash, else are
                     synthesized with monotonically_increasing_id
                     (stable within one run, documented as such).
  warc               a directory of WARC(.gz) segments, projected
                     through ``warc_to_corpus`` (T5 byte-identical text)
                     with T7 url-hash ids.

Everything is the library operators composed unchanged — this script
adds no semantics, only argument plumbing, so the cascade the CLI runs
is the same one the oracle gate verifies.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", choices=["parquet", "warc"],
                    default="parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--main-content", action="store_true",
                    help="treat the text column as HTML: run jusText-style"
                         " boilerplate removal first and clean the "
                         "extracted main content instead of the raw page")
    ap.add_argument("--boiler-length-low", type=int, default=70)
    ap.add_argument("--boiler-length-high", type=int, default=200)
    ap.add_argument("--boiler-stop-low", type=int, default=300,
                    help="stopword-density low threshold (thousandths)")
    ap.add_argument("--boiler-stop-high", type=int, default=320)
    ap.add_argument("--near-dup", action="store_true",
                    help="after the cascade, drop near-duplicates "
                         "(MinHash-LSH candidates -> exact Jaccard -> "
                         "connected components -> keep best quality)")
    ap.add_argument("--jaccard", type=float, default=0.5,
                    help="near-dup Jaccard threshold (with --near-dup)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    spark = SparkSession.builder.appName("clean_corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from abot_dotnet_core_spark.functions.cleaning import quality_cascade
    from abot_dotnet_core_spark.functions.udfs import url_hash64_udf

    if args.format == "warc":
        from abot_dotnet_core_spark.sources.warc import warc_to_corpus
        docs = warc_to_corpus(spark, args.input)
    else:
        docs = spark.read.parquet(args.input)
    if args.id_col not in docs.columns:
        if "url" in docs.columns:
            docs = docs.withColumn(args.id_col,
                                   url_hash64_udf(F.col("url")))
        else:
            docs = docs.withColumn(args.id_col,
                                   F.monotonically_increasing_id())

    if args.main_content:
        from abot_dotnet_core_spark.functions.boilerplate import (
            classify_blocks, main_content, page_blocks)
        blocks = page_blocks(
            docs.select(F.col(args.id_col).alias("url"),
                        F.col(args.text_col)),
            html_col=args.text_col, url_col="url")
        mc = main_content(classify_blocks(
            blocks, length_low=args.boiler_length_low,
            length_high=args.boiler_length_high,
            stop_low_millis=args.boiler_stop_low,
            stop_high_millis=args.boiler_stop_high))
        docs = mc.select(F.col("url").alias(args.id_col),
                         F.col("main_text").alias(args.text_col))

    cascade = quality_cascade(docs, text_col=args.text_col,
                              id_col=args.id_col)
    reasons = {r["reason"] or "kept": r["n"]
               for r in cascade.groupBy("reason")
               .agg(F.count("*").alias("n")).collect()}
    kept_ids = cascade.filter(F.col("kept")).select(args.id_col)
    kept = docs.join(kept_ids, args.id_col, "left_semi")

    if args.near_dup:
        from abot_dotnet_core_spark.functions.dedup import (
            jaccard_pairs, keep_best_representative, lsh_candidate_pairs,
            minhash_signatures, neardup_components)
        from abot_dotnet_core_spark.functions.textfns import with_quality
        nd_in = kept.select(args.id_col, args.text_col) \
            .localCheckpoint(eager=True)
        sigs = minhash_signatures(nd_in, id_col=args.id_col,
                                  text_col=args.text_col, k=4)
        cand = lsh_candidate_pairs(sigs, id_col=args.id_col, k=4, bands=2)
        pairs = jaccard_pairs(nd_in, cand, id_col=args.id_col,
                              text_col=args.text_col,
                              threshold=args.jaccard) \
            .select("id_a", "id_b")
        labels = neardup_components(nd_in, pairs, id_col=args.id_col)
        scored = with_quality(nd_in, text_col=args.text_col)
        reps = keep_best_representative(labels, scored,
                                        id_col=args.id_col) \
            .select(F.col("keep_id").alias(args.id_col))
        n_before = kept.count()
        kept = kept.join(reps, args.id_col, "left_semi")
        reasons["near_duplicate"] = n_before - kept.count()
        reasons["kept"] = reasons.get("kept", 0) \
            - reasons["near_duplicate"]

    kept.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    # reasons sums to the input count: the near-dup adjustment moves
    # docs from 'kept' into 'near_duplicate' without changing the total
    print(json.dumps({
        "input_docs": sum(reasons.values()),
        "kept": n_out,
        "reasons": {k: v for k, v in sorted(reasons.items())},
        "output": args.output,
    }))


if __name__ == "__main__":
    sys.exit(main())
