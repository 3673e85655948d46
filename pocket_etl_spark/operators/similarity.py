"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of each query vector against the
  corpus — the correctness baseline. Cross-join shaped: use only when one side
  is small (queries broadcast). JVM-side higher-order functions, no UDF.
- ``lsh_topk``: random-hyperplane LSH — corpus and queries are bucketed by the
  sign pattern of dot products against ``n_planes`` hyperplanes; top-k runs
  within matching buckets only. The scale path: shuffle is bounded by bucket
  sizes. Hyperplanes here are taken from the dataset itself (first ``n_planes``
  vectors) so the whole operator stays deterministic and SQL-mirrorable; a
  seeded-random-plane variant is a one-line swap.

Recall/scale tradeoff is the standard one (more planes → smaller buckets,
lower recall per table, union of L tables recovers it); tests measure recall
against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from pocket_etl_spark.functions import cosine_sim


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. ``queries`` must be small (it is broadcast)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("_qv"), F.col("_cv")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplane_buckets(
    df: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern LSH bucket per vector: bit i = sign(dot(v, plane_i)).
    ``planes`` is tiny → broadcast; one narrow pass over the corpus."""
    p = planes.select(
        F.col(id_col).alias("_pid"), _as_double(F.col(vec_col)).alias("_pv")
    )
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_pv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    signed = v.join(F.broadcast(p)).select(
        id_col,
        F.col("_pid"),
        F.when(dot > 0, F.expr("shiftleft(1L, cast(_pid as int))")).otherwise(F.lit(0)).alias("_bit"),
    )
    return signed.groupBy(id_col).agg(F.sum("_bit").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    cb = hyperplane_buckets(corpus, planes, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    qb = hyperplane_buckets(queries, planes, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")).join(
        cb, "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")).join(
        qb, "query_id"
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "query_id", "neighbor_id", cosine_sim(F.col("_qv"), F.col("_cv")).alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector maps to its ``n_probe`` nearest
    centroids by cosine (1 for corpus indexing, >1 for query probing).

    Centroids are a tiny frame → broadcast; the corpus makes ONE narrow pass
    (no shuffle of the vectors themselves — only (id, cell) pairs move).
    Deterministic tie-break (cos desc, centroid id asc) keeps the index
    reproducible across engines and cluster sizes. At 10^9 vectors the cell
    column becomes the partition key for cell-local files — probes then touch
    only n_probe partitions (classic IVF pruning)."""
    c = centroids.select(
        F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
    )
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    scored = v.join(F.broadcast(c)).select(
        id_col, "_cid", cosine_sim(F.col("_v"), F.col("_cv")).alias("_cos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .select(id_col, F.col("_cid").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score each query only against corpus vectors
    whose cell is among the query's ``n_probe`` nearest centroids — the
    coarse-quantizer pruning of FAISS-style IVF, in pure DataFrame ops."""
    cells = ivf_assign(corpus, centroids, 1, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    probes = ivf_assign(queries, centroids, n_probe, id_col, vec_col).withColumnRenamed(
        id_col, "query_id"
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).join(cells, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    ).join(probes, "query_id")
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .select(
            "query_id", "neighbor_id", cosine_sim(F.col("_qv"), F.col("_cv")).alias("_cos")
        )
        .dropDuplicates(["query_id", "neighbor_id"])  # same neighbor via 2 probes
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def ivf_write_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: corpus parquet PARTITIONED BY cell (nearest
    centroid). At 10^9 vectors this is the layout that makes probing cheap —
    a query reads only its n_probe cells' files (storage partition pruning),
    never the whole corpus. One narrow pass + one shuffle on cell."""
    cells = ivf_assign(corpus, centroids, 1, id_col, vec_col)
    (
        corpus.join(cells, id_col)
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a materialized IVF index (ivf_write_index): the probe-cell
    filter is on the PARTITION column, so the scan touches only n_probe cells'
    files per query set — the plan shows PartitionFilters, and the read volume
    is corpus_size * (probed_cells / num_cells) instead of the full table.
    Results are identical to ivf_topk on the same corpus (tested)."""
    probes = ivf_assign(queries, centroids, n_probe, id_col, vec_col).withColumnRenamed(
        id_col, "query_id"
    )
    # tiny driver-side list (≤ n_queries * n_probe cell ids) → partition pruning
    probe_cells = sorted(r["cell"] for r in probes.select("cell").distinct().collect())
    corpus = spark.read.parquet(index_path).filter(F.col("cell").isin(probe_cells))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"), "cell"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    ).join(probes, "query_id")
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .select(
            "query_id", "neighbor_id", cosine_sim(F.col("_qv"), F.col("_cv")).alias("_cos")
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold). With ``planes``
    the candidate set is LSH-bucketed (scale path); without, all-pairs within
    the frame (test scale only — documented O(n²))."""
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if planes is not None:
        b = hyperplane_buckets(df, planes, id_col, vec_col)
        v = v.join(b, id_col)
        join_cond = (F.col(f"a.bucket") == F.col(f"b.bucket")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
    else:
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, join_cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_sim(F.col("a._v"), F.col("b._v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
