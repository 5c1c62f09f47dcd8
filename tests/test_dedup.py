"""Semantics of the dedup layer (helpers + end-to-end on smoke SF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.functions.text import (
    word_shingles,
    words,
)
from tableau_dashboard_performance_etl_automation_spark.operators import dedup


def test_word_shingles_count_and_content(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], ["text"])
    out = df.withColumn("w", words()).select(
        "text", word_shingles().alias("sh")
    ).collect()
    by_text = {r.text: r.sh for r in out}
    assert by_text["a b c d"] == ["a b c", "b c d"]
    assert by_text["x y"] == []  # shorter than k → no shingles, no error


def test_exact_dedup_counts_duplicates(spark, tmp_path):
    # build a tiny documents table with a real duplicate
    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different")],
        ["doc_id", "text"],
    )
    p = str(tmp_path / "sf")
    docs.write.parquet(f"{p}/documents.parquet")
    out = {r.keep_id: r.n_copies for r in dedup.dedup_exact(spark, p).collect()}
    assert out[1] == 2  # the dup group keeps min doc_id
    assert out[3] == 1


def test_minhash_identical_docs_are_candidates(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated words appear in this sentence"),
        ],
        ["doc_id", "text"],
    )
    p = str(tmp_path / "sf")
    docs.write.parquet(f"{p}/documents.parquet")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, p).collect()
    }
    assert (1, 2) in pairs  # identical docs share every band
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_pairs_symmetric_free_and_bounded(spark, sf_dir):
    df = dedup.dedup_simhash(spark, sf_dir)
    assert df.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert df.filter(F.col("hamming") > dedup.SIMHASH_MAX_HAMMING).count() == 0


def test_jaccard_best_match_bounds(spark, sf_dir):
    df = dedup.dedup_ngram_jaccard(spark, sf_dir)
    bad = df.filter((F.col("jaccard") < 0) | (F.col("jaccard") > 1)).count()
    assert bad == 0
    # exactly one best-match row per doc that has any candidate pair
    assert df.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
