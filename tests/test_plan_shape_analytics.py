"""Golden plan-shape asserts for the analytics surface (SURVEY.md §5.8).

Correctness tests prove WHAT is computed; these prove the plan is the one
that survives a 100x scale-up: filters reach the parquet scan, projections
prune the read schema, small dims broadcast, and the relational hot path
stays inside WholeStageCodegen (no Python in the middle).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from analytics import crawl_queries, relational
from tests.conftest import SF_TEST


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sc1_pushdown_and_pruning(spark):
    p = plan(relational.sc1_pushdown_scan(spark, SF_TEST))
    assert "PushedFilters" in p
    assert "l_quantity" in p.split("PushedFilters")[1][:200]
    # read schema pruned to the 4 referenced columns, not all 16
    read = p.split("ReadSchema")[1][:300]
    assert "l_returnflag" in read and "l_extendedprice" in read
    assert "l_orderkey" not in read and "l_shipdate" not in read


def test_j1_broadcast_fires(spark):
    p = plan(relational.j1_broadcast_join(spark, SF_TEST))
    assert "BroadcastHashJoin" in p


def test_j4_anti_join_strategy(spark):
    p = plan(relational.j4_left_anti_join(spark, SF_TEST))
    assert "LeftAnti" in p


def test_x_math_wholestage_codegen(spark):
    """Scalar-function pipeline must be one codegen span, zero Python."""
    p = plan(relational.x_math_funcs(spark, SF_TEST))
    assert "codegen id" in p  # formatted-mode marker for WholeStageCodegen spans
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_frontier_pop_salted_shape(spark):
    """F5's plan: two Window nodes (salted then exact), no Python nodes,
    and the partial rank prunes before the second shuffle."""
    p = plan(crawl_queries.frontier_pop(spark, SF_TEST))
    assert p.count("Window") >= 2
    assert "ArrowEvalPython" not in p


def test_dedup_exact_partial_agg(spark):
    """Hash agg must be partial+final (map-side combine) — 'partial_' merge
    functions appear in the aggregate nodes."""
    from analytics import dedup

    p = plan(dedup.dedup_exact(spark, SF_TEST))
    assert "HashAggregate" in p
    assert "partial_" in p.lower() or "Partial" in p


def test_frontier_scan_partition_prunes(spark, tmp_path):
    """The status-partitioned frontier layout lets the pending scan skip
    done/failed files entirely (SURVEY.md §4 O5)."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("url_hash"),
        F.when(F.col("id") % 3 == 0, "pending").otherwise("done").alias("status"),
    )
    path = str(tmp_path / "frontier")
    df.write.partitionBy("status").parquet(path)
    scan = spark.read.parquet(path).where(F.col("status") == "pending")
    p = plan(scan)
    assert "PartitionFilters" in p
    assert "status" in p.split("PartitionFilters")[1][:200]
    assert scan.count() == 334
