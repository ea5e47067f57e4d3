"""The local Murmur3 must be bit-identical to Spark's hash() — the bucket
routing of every postings lookup depends on it."""

from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.spark_hash import bucket_of, spark_hash_string

TERMS = [
    "table", "join", "the", "a", "", "x", "ab", "abc", "abcd", "abcde",
    "café", "naïve", "日本語", "word123", "0", "zzzznotexist", "ß", "id42x99",
]


def test_matches_spark_hash(spark):
    df = spark.createDataFrame([(t,) for t in TERMS], "term string")
    got = {r["term"]: r["h"] for r in df.select("term", F.hash("term").alias("h")).collect()}
    for t in TERMS:
        assert spark_hash_string(t) == got[t], t


def test_bucket_matches_pmod(spark):
    df = spark.createDataFrame([(t,) for t in TERMS], "term string")
    got = {r["term"]: r["b"] for r in df.select("term", F.pmod(F.hash("term"), F.lit(64)).alias("b")).collect()}
    for t in TERMS:
        assert bucket_of(t, 64) == got[t], t
