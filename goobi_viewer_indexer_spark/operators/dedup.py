"""Deduplication operators for large-scale training-data pipelines.

The reference's dedup surface is constraint-style (duplicate-URN semi-join
batched 50/query, model/writestrategy/AbstractWriteStrategy.java:158-195;
grouped-metadata set-dedup, model/IndexObject.java:427-444; usage-stats
dedup-by-date, UsageStatisticsIndexer.java:76-150).  A 100 TB corpus needs
the full menu:

* exact        — hash-groupBy on sha256(content)
* minhash LSH  — word-shingles → 16 md5 minhashes → 8 bands → band-bucket
                 self-join → exact-Jaccard verify of candidates
* simhash      — 64-bit weighted-bit fingerprint, hamming-ball candidates
* n-gram Jaccard — exact set similarity over shingles for candidate pairs

Everything is built from Catalyst primitives (md5/hash/explode/groupBy/
array ops) so the LSH path is whole-stage-codegen JVM — no Python in the
hot loop.  md5 was chosen as the hash because it is engine-portable: the
DuckDB oracle computes the identical signatures, making even the LSH
pipeline value-checkable end to end.

Scale notes: the band self-join is the classic LSH shuffle — keyed by
(band_id, band_hash), uniform by construction; the exact-verify join only
touches candidate pairs.  Shingle explosion is the dominant shuffle and is
bounded by bands × docs, not docs².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr, duckdb_tokenize_sql

__all__ = [
    "exact_duplicates",
    "shingles_expr",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
    "simhash_fingerprint",
    "EXACT_DUP_SQL",
    "minhash_near_duplicates_sql",
    "simhash_sql",
]

N_MINHASH = 16
N_BANDS = 8  # rows-per-band = 2


# --------------------------------------------------------------------- exact
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents (hash-groupBy dedup)."""
    return (
        docs.select(
            F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha256"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_sha256")
        .agg(
            F.count("*").alias("n_copies"),
            F.array_join(F.array_sort(F.collect_list(F.col("doc_id").cast("string"))), ",").alias("doc_ids"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("content_sha256")
    )


EXACT_DUP_SQL = """
SELECT sha256(coalesce(text,'')) AS content_sha256,
       count(*) AS n_copies,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS doc_ids
FROM documents
GROUP BY 1
HAVING count(*) > 1
ORDER BY 1
""".strip()


# ------------------------------------------------------------------- minhash
def shingles_expr(text_col: str = "text", k: int = 3):
    """Distinct word k-shingles as array<string> (Catalyst expression)."""
    toks = tokenize_expr(text_col)
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            )
        )
    )


def _duckdb_shingles(text_col: str = "text", k: int = 3) -> str:
    toks = duckdb_tokenize_sql(text_col)
    parts = " || ' ' || ".join(f"__t[i+{j}]" for j in range(k))
    return (
        f"(SELECT CASE WHEN len(__t) < {k} THEN [] "
        f"ELSE list_distinct(list_transform(range(1, len(__t) - {k - 2}), i -> {parts})) END "
        f"FROM (SELECT {toks} AS __t) __s)"
    )


# affine-permutation minhash: ONE md5 per shingle (JVM MessageDigest
# serializes under thread contention — measured ~8 busy cores — so md5
# count matters), then mh_j = min((A_j * h + B_j) mod P) with h = the
# md5's first 8 hex chars as int, reduced mod P.  P Mersenne-prime 2^31-1;
# A_j/B_j fixed odd constants.  Same arithmetic is expressible in DuckDB,
# keeping the oracle value-identical.
_MH_P = (1 << 31) - 1
_MH_A = [2 * j + 1 + 1000003 * (j + 1) for j in range(N_MINHASH)]
_MH_B = [7919 * (j + 1) + 17 for j in range(N_MINHASH)]


def minhash_signature(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh array<long>, shingles) — affine-permutation minhash over
    one md5-derived base hash per shingle.

    One explode + n_hashes min-aggregates: the shingle set is computed
    ONCE (an n-column projection of array_min(transform(...)) would make
    Catalyst re-evaluate tokenize+shingling per hash — 16x the work, the
    difference between 15 s and 230 s at sf0.1).  Map-side partial min
    makes the shuffle carry one row per (doc, hash)."""
    sh_df = docs.select(F.col(id_col).alias("doc_id"), shingles_expr(text_col).alias("shingles"))
    exploded = sh_df.select("doc_id", F.explode("shingles").alias("s"))
    h = (F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long") % _MH_P).alias("h")
    exploded = exploded.select("doc_id", h)
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * _MH_A[j] + _MH_B[j]) % _MH_P).alias(f"_mh{j}")
            for j in range(n_hashes)
        ]
    )
    mh = F.array(*[F.col(f"_mh{j}") for j in range(n_hashes)])
    return (
        sh_df.join(sig, "doc_id", "left")
        .select("doc_id", mh.alias("mh"), "shingles")
    )


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Band buckets → self-join → distinct candidate (a,b) pairs, a<b."""
    rows_per_band = N_MINHASH // n_bands
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at("mh", bi * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bh"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over distinct shingles."""
    sigs = minhash_signature(docs, id_col, text_col).cache()
    sigs.count()  # materialize: three downstream branches (bands + both
    # sides of the verify join) would otherwise each recompute the
    # tokenize→shingle→minhash chain inside one action (~5x wall time)
    pairs = lsh_candidate_pairs(sigs)
    sh = sigs.select("doc_id", "shingles")
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.when(F.size(F.array_union("sh_a", "sh_b")) == 0, F.lit(0.0)).otherwise(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
    return j


def minhash_near_duplicates_sql(threshold: float = 0.7) -> str:
    sh = _duckdb_shingles()
    rows_per_band = N_MINHASH // N_BANDS
    mh_items = ", ".join(
        f"(SELECT min(((CAST(('0x' || substr(md5(s.x),1,8)) AS BIGINT) % {_MH_P}) * {_MH_A[j]} + {_MH_B[j]}) % {_MH_P}) "
        f"FROM unnest(shingles) AS s(x))"
        for j in range(N_MINHASH)
    )
    band_items = ", ".join(
        "(" + " || '|' || ".join(f"CAST(mh[{bi * rows_per_band + r + 1}] AS VARCHAR)" for r in range(rows_per_band)) + ")"
        for bi in range(N_BANDS)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {sh} AS shingles FROM documents
),
sig AS (
  SELECT doc_id, shingles, [{mh_items}] AS mh FROM sh
),
bands AS (
  SELECT doc_id, unnest([{band_items}]) AS bh,
         unnest(range(0, {N_BANDS})) AS band
  FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CASE WHEN len(list_distinct(list_concat(sa.shingles, sb.shingles))) = 0 THEN 0.0
              ELSE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                   / len(list_distinct(list_concat(sa.shingles, sb.shingles))) END AS j
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(j, 6) AS jaccard
FROM verified WHERE j >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# ------------------------------------------------------------------- simhash
def simhash_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash over tokens: bit i of the fingerprint = sign of
    Σ_tokens (±1 depending on bit i of md5(token)).

    32-bit variant (hex-parse stays in long range on both engines).
    Candidate retrieval at scale = group by fingerprint bands; here we
    emit (doc_id, simhash) for downstream hamming bucketing.
    """
    toks = tokenize_expr(text_col)
    # per-token 32-bit hash from the first 8 hex chars of md5
    th = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    # ONE fold over the token array accumulating all bit counters at once
    # (an array<long> of length ``bits``) — not one pass per bit
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    idxs = F.sequence(F.lit(0), F.lit(bits - 1))
    # bit i of h = floor(h / 2^i) % 2 (shiftright needs a literal count, so
    # arithmetic keeps the bit index a column inside the fold)
    pow2 = lambda i: F.pow(F.lit(2.0), i.cast("double"))  # noqa: E731
    bit_sums = F.aggregate(
        th,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            idxs,
            lambda a, i: a
            + F.when(F.floor(h / pow2(i)).cast("long") % 2 == 1, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            bit_sums,
            idxs,
            lambda s, i: F.when(s > 0, pow2(i).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.size(toks) == 0, F.lit(0).cast("long")).otherwise(sim).alias("simhash"),
    ).orderBy("doc_id")


def simhash_sql(bits: int = 32) -> str:
    toks = duckdb_tokenize_sql("text")
    bit_terms = " + ".join(
        f"(CASE WHEN (SELECT sum(CASE WHEN (CAST(('0x' || substr(md5(u.x),1,8)) AS BIGINT) >> {i}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) FROM unnest(toks) AS u(x)) > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
SELECT doc_id,
       CASE WHEN len(toks) = 0 THEN 0 ELSE {bit_terms} END AS simhash
FROM t ORDER BY doc_id
""".strip()
