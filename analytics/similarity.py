"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>[64], label).

- ``emb_cosine_pairs`` / ``ann_topk_bruteforce``: exact cosine via native
  higher-order functions (zip_with + aggregate — JVM-side, no Python),
  DuckDB-oracled against ``list_cosine_similarity``.
- ``ann_lsh_bucketed``: the 100 TB scale path — deterministic random-
  hyperplane LSH buckets candidates so the expensive exact rerank touches
  only bucket-mates, not the full corpus.  At cluster scale the bucket id
  is the shuffle key (one shuffle, skew-free by construction since the
  hyperplanes split the space evenly); brute-force is kept as the small-SF
  baseline and recall oracle (tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics.common import load

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b) -> Column:
    """Exact cosine similarity of two float-array columns (JVM HOFs)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def with_norm(e: DataFrame, vid: str, emb: str, norm: str) -> DataFrame:
    """Precompute each vector's L2 norm once — the pairwise stage then does
    one dot product per pair instead of three (the thing that matters when
    the pair count is corpus², not corpus)."""
    return e.select(
        F.col("vec_id").alias(vid),
        F.col("embedding").alias(emb),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias(norm),
    )


@q(
    "emb_cosine_pairs",
    """
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
             AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    """,
)
def emb_cosine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs: exact pairwise cosine above threshold
    (0.35 ~ top 0.1% of this corpus's pair distribution)."""
    e = load(spark, sf, "embeddings")
    a = with_norm(e, "v1", "e1", "n1")
    b = with_norm(e, "v2", "e2", "n2")
    c = _dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .where(c >= 0.35)
        .select("v1", "v2", F.round(c, 4).alias("cos"))
    )


@q(
    "ann_topk_bruteforce",
    """
    WITH s AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
    r AS (SELECT qid, cid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, cid) AS rk
          FROM s)
    SELECT qid, cid, rk, round(cos, 4) AS cos FROM r WHERE rk <= 5
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exact-recall
    baseline every ANN variant is judged against."""
    from pyspark.sql import Window

    e = load(spark, sf, "embeddings")
    qs = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cs = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    c = cosine(F.col("qe"), F.col("ce"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        qs.join(cs, F.col("cid") != F.col("qid"))
        .select("qid", "cid", c.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("qid", "cid", "rk", F.round("cos", 4).alias("cos"))
    )


N_PLANES = 6
DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (seed 42) — same planes every run,
    every engine, every cluster size."""
    import random

    rng = random.Random(42)
    return [[rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_PLANES)]


def lsh_bucket(emb: Column) -> Column:
    """Sign-of-projection bucket id (0..2^N_PLANES-1) — native HOFs only."""
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes()):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


@q("ann_lsh_bucketed")
def ann_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-path ANN: hyperplane-LSH bucket join + exact rerank inside
    buckets, with multi-probe out to Hamming distance 2.  On THIS corpus
    (uniform random vectors — no cluster structure) the analytic ceiling
    for 6 planes + 2-bit probes is ~0.6 recall of the true top-5; real
    embedding corpora are strongly clustered, where the same construction
    probes a constant bucket set while candidate volume stays O(n/2^P) —
    that is the 100 TB path.  Rows-only for the driver; recall vs brute
    force asserted in tests/test_pipeline_ops.py."""
    e = load(spark, sf, "embeddings").withColumn("bucket", lsh_bucket(F.col("embedding")))
    # multi-probe: query side also probes every bucket within Hamming
    # distance 2 of its own (1 + P + P*(P-1)/2 probes).
    flips = [0] + [1 << i for i in range(N_PLANES)] + [
        (1 << i) | (1 << j)
        for i in range(N_PLANES)
        for j in range(i + 1, N_PLANES)
    ]
    probes = e.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("probe_bucket"),
    )
    qs = probes.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "probe_bucket"
    )
    cs = e.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"), F.col("bucket").alias("probe_bucket")
    )
    c = cosine(F.col("qe"), F.col("ce"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        qs.join(cs, "probe_bucket")
        .where(F.col("cid") != F.col("qid"))
        .select("qid", "cid", c.alias("cos"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("qid", "cid", "rk", F.round("cos", 4).alias("cos"))
    )
