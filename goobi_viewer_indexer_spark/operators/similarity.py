"""Similarity search over embedding columns (array<float>).

Two paths, per the scale contract:

* :func:`cosine_topk_bruteforce` — exact top-k by cosine against one query
  vector; the dot product is a Catalyst fold (``aggregate``/``zip_with``),
  JVM-side, no UDF.  O(N·d) scan — the baseline and the verifier for the
  approximate path.
* :func:`cosine_topk_lsh` — random-hyperplane LSH (sign sketch) bucketing:
  probe only vectors sharing ≥1 of ``n_tables`` bucket keys with the
  query.  At 100 TB the bucketed table is written once, partitioned by
  (table, bucket) so a query prunes to a handful of partitions.
* :func:`embedding_near_duplicates` — near-dup pairs by cosine ≥ τ via the
  same LSH buckets (self-join within bucket), exact-verified.

Hyperplanes are deterministic (seeded numpy) so results are replayable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "cosine_topk_bruteforce",
    "cosine_topk_bruteforce_sql",
    "cosine_topk_lsh",
    "query_buckets",
    "AnnIndex",
    "IvfIndex",
    "embedding_near_duplicates",
    "embedding_near_duplicates_sql",
]


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            cosine_expr(F.col(vec_col), q).alias("cos_raw"),
        )
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
    )


def cosine_topk_bruteforce_sql(query_vec: list[float], k: int = 10, exclude_id: int | None = None) -> str:
    vec = "[" + ", ".join(f"{float(x)!r}" for x in query_vec) + "]::DOUBLE[]"
    excl = f"WHERE vec_id <> {exclude_id}" if exclude_id is not None else ""
    return f"""
WITH q AS (SELECT {vec} AS qv)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 6) AS cosine
FROM embeddings, q
{excl}
ORDER BY list_dot_product(embedding::DOUBLE[], qv)
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv, qv))) DESC, vec_id ASC
LIMIT {k}
""".strip()


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucketize(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket, embedding) — one row per (vector, table).

    Single scan of the source; all ``n_tables`` sign-sketches come out of
    ONE Arrow pandas UDF as a per-row bucket array that posexplode
    unpacks.  Round 6: the previous pure-Catalyst form evaluated
    ``n_tables × n_planes`` interpreted ``aggregate(zip_with(...))``
    lambda folds per row (the same interpreted-fold hot spot the round-5
    SimHash rewrite removed — guide §4.2); the UDF computes every
    hyperplane dot product of a batch in one BLAS matmul.  Sign semantics
    are unchanged (``d >= 0``) and now numerically CLOSER to the
    driver-side :func:`query_buckets` routing (both numpy)."""
    planes = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)], axis=0
    )  # (n_tables*n_planes, dim)
    weights = (2 ** np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T >= 0).astype(np.int64)          # (n, T*P)
        b = bits.reshape(len(vecs), n_tables, n_planes) @ weights  # (n, T)
        return pd.Series(list(b))

    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            _buckets(F.col(vec_col)).alias("_bkts"),
        )
        .select("vec_id", "embedding", F.posexplode("_bkts").alias("table", "bucket"))
        .select("vec_id", "table", "bucket", "embedding")
    )


def query_buckets(query_vec: list[float], n_tables: int = 4, n_planes: int = 8, seed: int = 7) -> list[tuple[int, int]]:
    """The (table, bucket) cells a query vector probes — driver-side, no job."""
    qv = np.asarray(query_vec, dtype=np.float64)
    out = []
    for t in range(n_tables):
        planes = _hyperplanes(len(query_vec), n_planes, seed + 1000 * t)
        out.append((t, int(sum((2 ** i) for i, p in enumerate(planes) if float(p @ qv) >= 0))))
    return out


class AnnIndex:
    """Persisted LSH-bucketed ANN index: :func:`bucketize` written ONCE as
    parquet partitioned by (table, bucket), then every query prunes to its
    ≤ n_tables partitions — at 100 TB a query touches n_tables directories
    instead of re-sketching the full table (the round-1 weak spot).
    ``.query()`` is plan-identical to :func:`cosine_topk_lsh` in results
    (same hyperplanes/seed), pinned by pytest."""

    def __init__(self, spark, path: str, dim: int, n_tables: int = 4, n_planes: int = 8, seed: int = 7):
        self.spark, self.path, self.dim = spark, path, dim
        self.n_tables, self.n_planes, self.seed = n_tables, n_planes, seed

    @classmethod
    def build(cls, embeddings: DataFrame, path: str, dim: int, n_tables: int = 4,
              n_planes: int = 8, seed: int = 7, id_col: str = "vec_id", vec_col: str = "embedding") -> "AnnIndex":
        b = bucketize(embeddings, dim, n_tables, n_planes, seed, id_col, vec_col)
        # co-locate each (table, bucket) cell in one task before the
        # partitioned write: otherwise EVERY write task opens a file in
        # every cell directory — n_tasks × n_cells tiny files (measured
        # 17 s → ~4 s at sf0.1) and a file-count explosion at scale
        b.repartition("table", "bucket").write.mode("overwrite").partitionBy("table", "bucket").parquet(path)
        return cls(embeddings.sparkSession, path, dim, n_tables, n_planes, seed)

    def query(self, query_vec: list[float], k: int = 10) -> DataFrame:
        cells = query_buckets(query_vec, self.n_tables, self.n_planes, self.seed)
        df = self.spark.read.parquet(self.path)
        pred = None
        for t, bkt in cells:
            c = (F.col("table") == t) & (F.col("bucket") == bkt)
            pred = c if pred is None else (pred | c)
        cands = df.filter(pred).dropDuplicates(["vec_id"])
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            cands.select("vec_id", cosine_expr(F.col("embedding"), q).alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
        )

    def query_many(self, queries: dict[str, list[float]], k: int = 10) -> dict[str, list[tuple[int, float]]]:
        """Batched hyperplane-LSH probes — one scan of the union of every
        query's (table, bucket) cells (see :func:`_ann_query_many`);
        identity with per-query :meth:`query` pinned in pytest."""
        routes = {qid: set(query_buckets(v, self.n_tables, self.n_planes, self.seed))
                  for qid, v in queries.items()}
        return _ann_query_many(self.spark, self.path, routes, queries, k)


def _ann_query_many(spark, path: str, routes: dict[str, set[tuple[int, int]]],
                    qvecs: dict[str, list[float]], k: int) -> dict[str, list[tuple[int, float]]]:
    """Shared batched-probe body (AnnIndex.query_many): scan the union of
    all probed (table, bucket) cells once, score each cell slice against
    the queries probing it, dedup per (qid, vec_id) (a vector colliding
    with a query in several tables scores once), per-qid bounded-window
    top-k."""
    results: dict[str, list] = {qid: [] for qid in qvecs}
    all_cells = sorted(set().union(*routes.values())) if routes else []
    if not all_cells:
        return results
    qmat = {qid: np.asarray(v, dtype=np.float64) for qid, v in qvecs.items()}
    qnorm = {qid: float(np.linalg.norm(v)) for qid, v in qmat.items()}

    def emit(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            for (t, bkt), grp in pdf.groupby(["table", "bucket"]):
                m = np.stack([np.asarray(e, dtype=np.float64) for e in grp["embedding"]])
                norms = np.linalg.norm(m, axis=1)
                for qid, cs in routes.items():
                    if (int(t), int(bkt)) not in cs:
                        continue
                    den = norms * qnorm[qid]
                    cos = np.where(den > 0, (m @ qmat[qid]) / np.maximum(den, 1e-30), 0.0)
                    yield pd.DataFrame({"qid": qid, "vec_id": grp["vec_id"].values,
                                        "cos_raw": cos})

    df = spark.read.parquet(path)
    pred = None
    for t, bkt in all_cells:
        c = (F.col("table") == t) & (F.col("bucket") == bkt)
        pred = c if pred is None else (pred | c)
    scored = (
        df.filter(pred).select("vec_id", "embedding", "table", "bucket")
        .mapInPandas(emit, "qid string, vec_id long, cos_raw double")
        .groupBy("qid", "vec_id").agg(F.max("cos_raw").alias("cos_raw"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    rows = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("qid", "vec_id", F.round("cos_raw", 6).alias("cosine"), "_rk")
        .collect()
    )
    for r in sorted(rows, key=lambda r: (r["qid"], r["_rk"])):
        results[r["qid"]].append((r["vec_id"], r["cosine"]))
    return results


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors colliding with the query in
    ≥1 LSH table.  Recall grows with n_tables; exactness is verified in
    tests against the brute-force scan.  This form re-sketches the table
    per query — the one-shot/ad-hoc path; for repeated queries build an
    :class:`AnnIndex` (sketch once, partition-pruned probes).  Round 6:
    one :func:`bucketize` scan filtered to the query's (table, bucket)
    cells — the same sketch the persisted index stores — instead of
    n_tables unioned re-reads each paying the interpreted fold."""
    dim = len(query_vec)
    cells = query_buckets(query_vec, n_tables, n_planes, seed)
    b = bucketize(embeddings, dim, n_tables, n_planes, seed, id_col, vec_col)
    pred = None
    for t, bkt in cells:
        c = (F.col("table") == t) & (F.col("bucket") == bkt)
        pred = c if pred is None else (pred | c)
    cands = b.filter(pred).dropDuplicates(["vec_id"]).select("vec_id", "embedding")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select("vec_id", cosine_expr(F.col("embedding"), q).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ τ via LSH-bucket self-join.

    Scale path (replaces the former O(N²) cross join): sign-sketch each
    vector into ``n_tables`` buckets (:func:`bucketize`), equi-join on
    (table, bucket) so only colliding vectors pair up, dedup candidate
    pairs, then exact-cosine-verify candidates only.  The shuffle is keyed
    by (table, bucket) — linear in N·n_tables, never N².  Recall for
    τ=0.95 with 8×8 tables/planes is ≥0.98 analytically ((1-(1-.899^8)^8);
    identical vectors collide with probability 1); the planted-duplicate
    pytest pins it empirically.  The DuckDB oracle keeps the exact
    all-pairs form — valid only at small sf.
    """
    b = bucketize(embeddings, dim=dim, n_tables=n_tables, n_planes=n_planes,
                  seed=seed, id_col=id_col, vec_col=vec_col)
    left = b.select(F.col("table"), F.col("bucket"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    right = b.select(F.col("table"), F.col("bucket"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cand = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        # one candidate row per pair even when it collides in several tables
        .groupBy("id_a", "id_b")
        .agg(F.first("va").alias("va"), F.first("vb").alias("vb"))
    )
    return (
        cand.withColumn("cos_raw", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


def embedding_near_duplicates_sql(threshold: float = 0.95) -> str:
    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
ORDER BY id_a, id_b
""".strip()


class IvfIndex:
    """IVF (inverted-file) ANN — the k-means-cell alternative to the
    hyperplane :class:`AnnIndex`: centroids from ``pyspark.ml`` KMeans,
    vectors written partitioned by nearest-centroid cell, queries probe
    the ``nprobe`` nearest cells (directory-level pruning: a query reads
    nprobe/n_cells of the data).  IVF adapts to the data distribution
    (clustered embeddings → balanced cells) where sign sketches are
    data-oblivious; recall is tunable per query via ``nprobe`` with no
    rebuild.  Centroids persist beside the data, so probe routing is a
    driver-side argmin — no Spark job."""

    def __init__(self, spark, path: str):
        import json as _json
        import os as _os

        self.spark, self.path = spark, path
        with open(_os.path.join(path, "_centroids.json")) as f:
            self.centroids = np.asarray(_json.load(f), dtype=np.float64)
        self.scales: np.ndarray | None = None
        qf = _os.path.join(path, "_quant.json")
        if _os.path.exists(qf):
            with open(qf) as f:
                self.scales = np.asarray(_json.load(f)["scales"], dtype=np.float64)

    @classmethod
    def build(cls, embeddings: DataFrame, path: str, n_cells: int = 16, seed: int = 7,
              id_col: str = "vec_id", vec_col: str = "embedding",
              quantize: bool = False) -> "IvfIndex":
        """``quantize=True`` additionally stores per-dimension symmetric
        int8 codes (``code = round(x / scale)``, ``scale = max|x_dim| /
        127`` over the corpus — one posexplode agg) as a BINARY column.
        At 100 TB this is the IO lever: the probe scan column-prunes to
        (vec_id, codes) — 8× less than float64 arrays — and only the
        ``rerank`` survivors touch full-precision vectors."""
        import json as _json
        import os as _os

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array

        feats = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )
        model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feats)
        assigned = model.transform(feats).select(
            "vec_id", "embedding", F.col("prediction").alias("cell")
        )
        scales = None
        if quantize:
            mx = (
                assigned.select(F.posexplode(F.col("embedding").cast("array<double>"))
                                .alias("pos", "x"))
                .groupBy("pos").agg(F.max(F.abs(F.col("x"))).alias("m"))
                .orderBy("pos").collect()
            )
            scales = np.asarray([max(r["m"], 1e-30) / 127.0 for r in mx], dtype=np.float64)
            sc = scales

            @F.pandas_udf("binary")
            def _encode(col: pd.Series) -> pd.Series:
                return col.map(lambda v: (
                    np.clip(np.round(np.asarray(v, np.float64) / sc), -127, 127)
                    .astype(np.int8).tobytes()))

            assigned = assigned.withColumn("codes", _encode(F.col("embedding")))
        (
            assigned.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(path)
        )
        cents = [list(map(float, c)) for c in model.clusterCenters()]
        with open(_os.path.join(path, "_centroids.json"), "w") as f:
            _json.dump(cents, f)
        if quantize:
            with open(_os.path.join(path, "_quant.json"), "w") as f:
                _json.dump({"scales": [float(s) for s in scales]}, f)
        return cls(embeddings.sparkSession, path)

    def _probe_cells(self, query_vec, nprobe: int) -> list[int]:
        qv = np.asarray(query_vec, dtype=np.float64)
        d = np.linalg.norm(self.centroids - qv, axis=1)
        return [int(c) for c in np.argsort(d)[:nprobe]]

    def query(self, query_vec: list[float], k: int = 10, nprobe: int = 2) -> DataFrame:
        cells = self._probe_cells(query_vec, nprobe)
        df = self.spark.read.parquet(self.path).filter(F.col("cell").isin(cells))
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            df.select("vec_id", cosine_expr(F.col("embedding"), q).alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
        )

    def query_many(self, queries: dict[str, list[float]], k: int = 10,
                   nprobe: int = 2) -> dict[str, list[tuple[int, float]]]:
        """Batched ANN: ONE job answers every query — the union of all
        probed cells is scanned once (still partition-pruned to the
        probed subset), each row scores only against the queries whose
        probe set contains its cell (one vectorized matmul per
        (batch, cell) slice), and the reduce is a per-qid bounded window.
        The embedding-join amortization: N queries cost one scan of
        their cell union instead of N scans."""
        routes = {qid: set(self._probe_cells(v, nprobe)) for qid, v in queries.items()}
        all_cells = sorted(set().union(*routes.values())) if routes else []
        results: dict[str, list] = {qid: [] for qid in queries}
        if not all_cells:
            return results
        qmat = {qid: np.asarray(v, dtype=np.float64) for qid, v in queries.items()}
        qnorm = {qid: float(np.linalg.norm(v)) for qid, v in qmat.items()}

        def emit(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                for cell, grp in pdf.groupby("cell"):
                    m = np.stack([np.asarray(e, dtype=np.float64) for e in grp["embedding"]])
                    norms = np.linalg.norm(m, axis=1)
                    for qid, cs in routes.items():
                        if int(cell) not in cs:
                            continue
                        den = norms * qnorm[qid]
                        cos = np.where(den > 0, (m @ qmat[qid]) / np.maximum(den, 1e-30), 0.0)
                        yield pd.DataFrame({"qid": qid, "vec_id": grp["vec_id"].values,
                                            "cos_raw": cos})

        base = self.spark.read.parquet(self.path).filter(F.col("cell").isin(all_cells))
        scored = base.select("vec_id", "embedding", "cell").mapInPandas(
            emit, "qid string, vec_id long, cos_raw double")

        from pyspark.sql.window import Window

        w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        rows = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select("qid", "vec_id", F.round("cos_raw", 6).alias("cosine"), "_rk")
            .collect()
        )
        for r in sorted(rows, key=lambda r: (r["qid"], r["_rk"])):
            results[r["qid"]].append((r["vec_id"], r["cosine"]))
        return results

    def query_quantized(self, query_vec: list[float], k: int = 10, nprobe: int = 2,
                        rerank: int | None = None) -> DataFrame:
        """Two-stage SQ8 probe: (1) the approximate pass scans ONLY the
        int8 ``codes`` column of the probed cells (asymmetric distance —
        dequantized codes against the FULL-precision query, so the query
        side loses nothing) and keeps the top ``rerank`` (default 4·k)
        candidates; (2) the exact pass joins those ids back to the
        full-precision vectors of the SAME pruned cells and emits the
        true cosine on the usual round6 grid — returned scores are
        EXACT, quantization only affects which candidates reach the
        rerank (recall pinned vs the unquantized probe in pytest)."""
        if self.scales is None:
            raise ValueError("index was built without quantize=True")
        rerank = max(k, rerank if rerank is not None else 4 * k)
        cells = self._probe_cells(query_vec, nprobe)
        qv = np.asarray(query_vec, dtype=np.float64)
        qn = float(np.linalg.norm(qv))
        sc = self.scales

        @F.pandas_udf("double")
        def _approx(codes: pd.Series) -> pd.Series:
            if len(codes) == 0:
                return pd.Series([], dtype=np.float64)
            m = np.frombuffer(b"".join(codes), dtype=np.int8).reshape(len(codes), -1)
            dq = m.astype(np.float64) * sc
            num = dq @ qv
            den = np.linalg.norm(dq, axis=1) * qn
            return pd.Series(np.where(den > 0, num / np.maximum(den, 1e-30), 0.0))

        base = self.spark.read.parquet(self.path).filter(F.col("cell").isin(cells))
        cand = (
            base.select("vec_id", _approx(F.col("codes")).alias("approx"))
            .orderBy(F.desc("approx"), F.asc("vec_id"))
            .limit(rerank)
        )
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            base.join(cand.select("vec_id"), "vec_id", "left_semi")
            .select("vec_id", cosine_expr(F.col("embedding"), q).alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
        )
