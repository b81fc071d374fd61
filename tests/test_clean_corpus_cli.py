"""End-to-end test of the corpus-cleaning CLI (scripts/clean_corpus.py):
the cascade reasons, the parquet output, and the --near-dup selection —
driven through main() exactly as spark-submit would."""

import importlib.util
import json
import sys

from pyspark.sql import Row

GOOD = ("the quick brown foxes jumped over many lazy dogs today and "
        * 6).strip()
NEAR = GOOD.replace("quick", "swift", 1)


def _run_cli(monkeypatch, capsys, argv):
    spec = importlib.util.spec_from_file_location(
        "clean_corpus", "/root/repo/scripts/clean_corpus.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["clean_corpus.py"] + argv)
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, schema="doc_id long, text string") \
        .write.parquet(path)
    return path


def test_cascade_reasons_and_output(spark, tmp_path, monkeypatch, capsys):
    path = _write_docs(spark, tmp_path, [
        Row(doc_id=1, text=GOOD),
        Row(doc_id=2, text=GOOD),                                 # duplicate
        Row(doc_id=3, text="too few words to pass the gate"),     # gopher
        Row(doc_id=4, text=GOOD + " привет мир слово здесь" * 60),  # script
        Row(doc_id=5, text=GOOD + " page not found and 404 not found"),
    ])
    out_dir = str(tmp_path / "clean")
    summary = _run_cli(monkeypatch, capsys,
                       ["--input", path, "--output", out_dir])
    assert summary["input_docs"] == 5
    assert summary["kept"] == 1
    assert summary["reasons"] == {"duplicate": 1, "gopher": 1,
                                  "kept": 1, "script": 1, "soft404": 1}
    kept = spark.read.parquet(out_dir).collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].text == GOOD


def test_near_dup_flag(spark, tmp_path, monkeypatch, capsys):
    path = _write_docs(spark, tmp_path, [
        Row(doc_id=1, text=GOOD),
        Row(doc_id=2, text=NEAR),   # near (not exact) duplicate of 1
    ])
    plain = _run_cli(monkeypatch, capsys,
                     ["--input", path,
                      "--output", str(tmp_path / "plain")])
    assert plain["kept"] == 2      # exact dedup does NOT catch it
    nd = _run_cli(monkeypatch, capsys,
                  ["--input", path, "--near-dup", "--jaccard", "0.5",
                   "--output", str(tmp_path / "nd")])
    assert nd["kept"] == 1
    assert nd["reasons"]["near_duplicate"] == 1
    assert nd["input_docs"] == 2


def test_ids_from_url_when_missing(spark, tmp_path, monkeypatch, capsys):
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [Row(url="http://a.test/1", text=GOOD)],
        schema="url string, text string").write.parquet(path)
    summary = _run_cli(monkeypatch, capsys,
                       ["--input", path,
                        "--output", str(tmp_path / "o")])
    assert summary["kept"] == 1
    row = spark.read.parquet(str(tmp_path / "o")).collect()[0]
    from abot_dotnet_core_spark.kernel.urlnorm import url_hash64
    assert row.doc_id == url_hash64("http://a.test/1")


def test_main_content_stage(spark, tmp_path, monkeypatch, capsys):
    html = ('<html><body><div><a href="/1">nav one</a> '
            '<a href="/2">nav two</a></div><p>' + GOOD
            + '</p></body></html>')
    path = _write_docs(spark, tmp_path, [Row(doc_id=1, text=html)])
    out_dir = str(tmp_path / "mc")
    summary = _run_cli(monkeypatch, capsys, [
        "--input", path, "--output", out_dir, "--main-content",
        "--boiler-length-low", "20", "--boiler-length-high", "60",
        "--boiler-stop-low", "100", "--boiler-stop-high", "150"])
    assert summary["kept"] == 1
    row = spark.read.parquet(out_dir).collect()[0]
    # the nav boilerplate is gone; the kept text IS the main content
    assert row.text == GOOD
