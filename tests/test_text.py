"""Text operator tests: stats, language id, quality, fingerprints."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.functions import token_count, tokens
from ml_feature_store_pipeline_spark.operators import text


def test_tokens_edge_cases(spark):
    df = spark.createDataFrame(
        [("  a  b c  ",), ("",), ("   ",), ("single",)], "text: string"
    )
    out = [r["n"] for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert out == [3, 0, 0, 1]


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42")], "doc_id long, text string")
    row = text.text_stats(df, "doc_id", "text").collect()[0]
    assert row["n_chars"] == 16
    assert row["n_tokens"] == 3
    # BPE-ish: Hello , world ! 42 → 5
    assert row["n_tokens_bpeish"] == 5
    assert row["n_whitespace"] == 2
    assert row["punct_ratio"] == pytest.approx(2 / 16)
    assert row["digit_ratio"] == pytest.approx(2 / 16)


def test_language_id(spark):
    rows = [
        (1, "the cat is in the house and it is warm"),
        (2, "der Hund ist nicht ein Tier und das ist gut"),
        (3, "le chat est dans la maison et les chiens"),
        (4, "xyzzy plugh qwerty"),  # no stopwords → und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_guess"] for r in text.language_id(df, "doc_id", "text").collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_ordering(spark):
    rows = [
        (1, "the report describes a complete analysis of the data in it"),  # clean English
        (2, "!!! ??? *** $$$ ### @@@"),  # punctuation garbage
        (3, "12345 67890 11111 22222"),  # digit garbage
        (4, "ok"),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r["doc_id"]: r["quality_score"] for r in text.quality_score(df, "doc_id", "text").collect()}
    assert s[1] > s[2] and s[1] > s[3] and s[1] > s[4]
    assert s[2] == 0.0  # punct ratio ≥ 0.5 zeroes the score
    assert all(0.0 <= v <= 1.0 for v in s.values())


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "goodbye")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.fingerprint(df, "doc_id", "text").collect()}
    assert out[1]["fp_raw"] != out[2]["fp_raw"]
    assert out[1]["fp_normalized"] == out[2]["fp_normalized"]  # case+space insensitive
    assert out[1]["fp_normalized"] != out[3]["fp_normalized"]
    assert out[2]["fp_raw"] == hashlib.md5(b"hello world").hexdigest()  # md5 parity
