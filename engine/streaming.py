"""Structured Streaming surface (SURVEY.md §2.2 ST1-ST9).

The crawl engine's production loop is *epoch-batch* by spec
(BASELINE.json:6 "Each scheduling epoch is a batch job") — state lives in
the frontier/seen_filter tables, strictly stronger than an SS state store
for resumability.  This module exposes the equivalent streaming concepts
over the same data so a deployment that prefers a continuous pipeline
(e.g. feeding freshly crawled documents into the training-data pipeline)
gets them with identical semantics:

  ST1  micro-batch over a file source, trigger(availableNow=True)
  ST2  watermark + late-data tolerance on event time
  ST3-5  tumbling / sliding / session windowed aggregation
  ST6  stateful dedup (dropDuplicatesWithinWatermark) and a custom
       per-host stateful operator via applyInPandasWithState — the
       streaming twin of the politeness budget counter.
  ST7  stream-static broadcast enrichment join.
  ST8  stream-stream interval join (watermarked two-sided state).
  ST9  transformWithStateInPandas (Spark 4 arbitrary-state v2): the
       ST6b counter re-expressed on the modern StatefulProcessor API
       with typed MapState.  ENVIRONMENT-GATED: the API's Python driver
       worker needs google.protobuf, absent from this container (same
       class of gate as the Iceberg jar, engine/catalog.py) — code is
       complete, the pytest skips with the reason when protobuf is
       missing and runs the stream==batch check when present.

Each streaming query is checked against its *batch* twin in
tests/test_streaming.py: same input files, same result.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_events(spark: SparkSession, sf_dir: str, max_files: int | None = None) -> DataFrame:
    """ST1: the driver's events table as a file-source stream."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(sf_dir)


def run_available_now(sdf: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drain a stream with trigger(availableNow=True) into a memory sink and
    return the materialized result (micro-batch loop runs to completion)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.sql(f"SELECT * FROM {name}")


def tumbling_counts(events: DataFrame) -> DataFrame:
    """ST3 (streaming twin of analytics.relational.st3_tumbling_window)."""
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "total",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """ST4: 10-minute windows sliding by 5."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n")
    )


def session_counts(events: DataFrame) -> DataFrame:
    """ST5: per-user session windows (30-minute gap)."""
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            "n",
        )
    )


def watermarked_counts(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """ST2: event-time watermark; append mode emits only finalized windows.
    (parquet infers ts as TIMESTAMP_NTZ; watermarks require TIMESTAMP, so
    cast — sessions pin UTC, making the cast a no-op on the wall clock.)"""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n")
    )


def dedup_within_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """ST6a: stateful streaming dedup — the streaming twin of the
    URL-seen D2 anti-join, bounded-state via watermark."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


HOST_COUNT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("events_seen", LongType()),
        StructField("batch_events", LongType()),
    ]
)
_STATE_SCHEMA = "total LONG"


def host_budget_state(rows: DataFrame, host_col: str = "host") -> DataFrame:
    """ST6b: custom stateful operator (applyInPandasWithState) — a
    continuously-maintained per-host fetch counter, the streaming twin of
    the politeness budget bookkeeping (engine/crawl.py politeness gate).

    State = one LONG per host; each micro-batch emits the host's running
    total and the batch contribution.  At cluster scale state is
    hash-partitioned by host across executors exactly like the frontier's
    host_bucket partitioning.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            {"host": [key[0]], "events_seen": [total], "batch_events": [batch]}
        )

    return rows.groupBy(host_col).applyInPandasWithState(
        update,
        outputStructType=HOST_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True iff transformWithStateInPandas can actually run here: its
    Python driver worker imports google.protobuf at stream start (the
    TWS state-server protocol is protobuf-framed).  Probed by import, the
    same way engine/catalog.py gates the Iceberg MERGE on its jar."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


HOST_TYPE_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("event_type", StringType()),
        StructField("events_seen", LongType()),
    ]
)


class _HostTypeCounts(StatefulProcessor):
    """ST9 StatefulProcessor body: per-host MapState[event_type -> count].

    Subclasses StatefulProcessor directly — importing the base class needs
    no protobuf (verified in this container); only *starting* a
    transformWithStateInPandas query does, which is what tws_available()
    gates.

    vs ST6b (host_budget_state): same politeness-bookkeeping semantics,
    but on the v2 API — typed per-key MapState replaces the single packed
    tuple, so a host's per-type counters update independently (at web
    scale: no read-modify-write of one fat blob per host, and RocksDB
    state backend + changelog checkpointing come for free).  Emission is
    order-independent (running totals, not admitted rows), so the final
    update per (host, event_type) equals the batch groupBy count however
    micro-batches split — including the NULL event_type group, which the
    batch groupBy emits and which therefore gets its own ValueState here
    (MapState keys are schema-typed non-null; value_counts(dropna=False)
    would also hand NaN keys to the state server, so the null bucket is
    counted via isna() and kept out of the map).
    """

    def init(self, handle: Any) -> None:
        self.counts = handle.getMapState("counts", "event_type STRING", "n LONG")
        self.null_count = handle.getValueState("null_n", "n LONG")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        batch: dict[str, int] = {}
        null_n = 0
        for pdf in rows:
            col = pdf["event_type"]
            null_n += int(col.isna().sum())
            for t, n in col.value_counts().items():
                batch[t] = batch.get(t, 0) + int(n)
        totals: dict[str | None, int] = {}
        for t, n in batch.items():
            # one state-server round trip per key: getValue returns None
            # for a missing key, so no containsKey pre-probe
            v = self.counts.getValue((t,))
            totals[t] = (int(v[0]) if v is not None else 0) + n
            self.counts.updateValue((t,), (totals[t],))
        if null_n:
            v = self.null_count.get()
            tot = (int(v[0]) if v is not None else 0) + null_n
            self.null_count.update((tot,))
            totals[None] = tot
        yield pd.DataFrame(
            {
                "host": [key[0]] * len(totals),
                "event_type": list(totals),
                "events_seen": list(totals.values()),
            }
        )

    def close(self) -> None:
        pass


def host_type_counts_tws(rows: DataFrame, host_col: str = "host") -> DataFrame:
    """ST9: the modern (Spark 4, SPARK-49564 "arbitrary state v2")
    stateful operator — transformWithStateInPandas with typed MapState.
    Call tws_available() first; see module docstring for the gate."""
    return rows.groupBy(host_col).transformWithStateInPandas(
        _HostTypeCounts(),
        outputStructType=HOST_TYPE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def segment_rollup(events: DataFrame, dim: DataFrame) -> DataFrame:
    """ST7: stream-static join — enrich the event stream with a static
    (batch) dimension table and aggregate per segment.

    The static side is broadcast: Spark re-plans the dim scan each
    micro-batch but never shuffles the stream for the join (stream-static
    joins are stateless — no watermark, no join state store).  This is
    the continuous-deployment twin of the crawl engine's per-epoch
    robots/budgets broadcast joins: a per-host dim enriching the fetched
    stream."""
    joined = events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey, "inner"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """ST8: stream-stream interval join — the canonical attribution
    pattern: every purchase matched to each click by the same user in the
    preceding 30 minutes.

    Works on two STREAMS (each side watermarked; the equality key
    user_id plus the two-sided event-time bound let the state store evict
    a buffered row once the other side's watermark passes its join
    horizon — state is O(events within watermark+horizon), not
    O(stream)) and on two BATCH frames (the watermark is a no-op), which
    is how tests/test_streaming.py proves stream == batch on the same
    files and how the st8 driver registration carries a DuckDB oracle.

    Scale shape: the join key is user_id, so both sides hash-partition
    on it (bounded skew — a user's click/purchase rate is politeness-
    bounded in the crawl analogy) and the time-range predicate is
    evaluated inside the per-key state store, never as a cross product."""
    # TIMESTAMP_NTZ -> TIMESTAMP cast: see watermarked_counts (ST2)
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .alias("c")
    )
    p = (
        purchases.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .alias("p")
    )
    pairs = c.join(
        p,
        F.expr(
            "p.user_id = c.user_id AND "
            "p.ts >= c.ts AND p.ts <= c.ts + interval 30 minutes"
        ),
        "inner",
    )
    return pairs.select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        (F.unix_timestamp("p.ts") - F.unix_timestamp("c.ts")).alias("lag_s"),
    )
