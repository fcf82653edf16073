"""F5 pop: determinism under parallelism + salting equivalence under skew
(SURVEY.md §5.3 pop determinism, §5.6 skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.frontier import pop_frontier
from engine.xxh64 import xxh64_str


def _synthetic_frontier(spark, n_hosts=40, hot_rows=5000, cold_rows=5):
    """One hot host (host0000: ~50% of rows) + many cold hosts."""
    rows = []
    for h in range(n_hosts):
        host = f"host{h:04d}.example"
        n = hot_rows if h == 0 else cold_rows
        for p in range(n):
            url = f"https://{host}/page/{p}"
            rows.append(
                (xxh64_str(url), url, host, p % 7, float(p % 7), 3 + (h % 4))
            )
    return spark.createDataFrame(
        rows, "url_hash long, url string, host string, depth int, priority double, k int"
    )


def _collect_pop(df, salt):
    return sorted(
        (r["host"], r["fetch_seq_in_host"], r["url_hash"])
        for r in pop_frontier(df, salt).collect()
    )


def test_pop_deterministic_across_shuffle_partitions(spark):
    df = _synthetic_frontier(spark)
    ref = None
    for parts in (1, 8, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        got = _collect_pop(df, salt=16)
        if ref is None:
            ref = got
        assert got == ref, f"pop differs at shuffle.partitions={parts}"
    spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_salted_pop_equals_unsalted(spark):
    """O9: the two-stage salted rank must be a pure optimization."""
    df = _synthetic_frontier(spark)
    assert _collect_pop(df, salt=1) == _collect_pop(df, salt=16) == _collect_pop(df, salt=64)


def test_pop_respects_budget_and_order(spark):
    df = _synthetic_frontier(spark, n_hosts=10, hot_rows=100, cold_rows=10)
    popped = pop_frontier(df, salt=8).collect()
    by_host: dict[str, list] = {}
    for r in popped:
        by_host.setdefault(r["host"], []).append(r)
    for host, rows in by_host.items():
        k = 3 + (int(host[4:8]) % 4)
        assert len(rows) <= k
        rows.sort(key=lambda r: r["fetch_seq_in_host"])
        keys = [(r["priority"], r["depth"], r["url_hash"]) for r in rows]
        assert keys == sorted(keys), f"pop order not monotone for {host}"


def test_pop_plan_shape(spark):
    """Plan test (§5.8): two window nodes, salted partition spec in stage 1."""
    df = _synthetic_frontier(spark, n_hosts=4, hot_rows=10, cold_rows=5)
    plan = pop_frontier(df, salt=16)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("row_number") == 2
    assert "_salt" in plan


def test_pending_scan_partition_pruning(spark, tmp_path):
    """§5.8 O5: scanning status='pending' on a status-partitioned frontier
    must prune to the pending partition only (PartitionFilters in plan)."""
    df = _synthetic_frontier(spark, n_hosts=4, hot_rows=10, cold_rows=5).withColumn(
        "status", F.when(F.col("depth") % 2 == 0, "pending").otherwise("done")
    )
    path = str(tmp_path / "fr")
    df.write.partitionBy("status").parquet(path)
    q = spark.read.parquet(path).where(F.col("status") == "pending")
    physical = q._jdf.queryExecution().executedPlan().toString()
    assert "status" in physical and "pending" in physical
    # all rows come back from the pending partition only
    assert q.select("status").distinct().collect()[0]["status"] == "pending"


def test_salted_stage1_balances_hot_host(spark):
    """§5.6 full skew assertion: after salting, no (host, salt) group of
    the hot host carries more than ~2/S of its rows — i.e. no single task
    ever sorts the whole hot host."""
    salt = 16
    df = _synthetic_frontier(spark, n_hosts=20, hot_rows=8000, cold_rows=5)
    sizes = (
        df.where(F.col("host") == "host0000.example")
        .groupBy(F.pmod("url_hash", F.lit(salt)).alias("s"))
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    assert len(sizes) == salt  # every salt bucket used
    assert max(r["count"] for r in sizes) <= 2 * total // salt
