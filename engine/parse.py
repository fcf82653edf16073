"""X2 — outlink extraction + canonicalization of discovered URLs.

X1 span parsing is fused into engine/fetch.py (same Arrow crossing); this
module owns the relational tail: explode the per-document outlink arrays
(native UDTF-shaped ``explode``, UD6 — no Python UDTF), resolve+canonicalize
each raw link against its parent (C1 pandas_udf), attach url keys (C2/C3),
and collapse same-epoch duplicate discoveries to the candidate with the
smallest (depth, parent_hash) — the normative intra-batch dedup rule shared
with the pyref oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.canonicalize import canonicalize_with_base_udf, with_url_keys
from engine.synthgraph import GraphConfig


def extract_candidates(fetched: DataFrame, cfg: GraphConfig, n_buckets: int) -> DataFrame:
    """Successful fetches → deduped canonical child-URL candidates."""
    links = (
        fetched.where(F.col("ok") & (F.col("depth") < F.lit(cfg.max_depth)))
        .select(
            F.col("url_hash").alias("parent_hash"),
            F.col("url").alias("base_url"),
            (F.col("depth") + 1).cast("int").alias("depth"),
            F.explode("outlinks").alias("raw_url"),
        )
        .withColumn("url", canonicalize_with_base_udf("raw_url", "base_url"))
        .where(F.col("url").isNotNull())
        .drop("raw_url", "base_url")
    )
    keyed = with_url_keys(links, n_buckets)
    # same-epoch dedup: keep min (depth, parent_hash) per url_hash (normative)
    w = Window.partitionBy("url_hash").orderBy(F.col("depth").asc(), F.col("parent_hash").asc())
    return keyed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
