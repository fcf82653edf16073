"""E1 — the epoch driver loop: one Spark batch job per scheduling epoch.

Per-epoch dataflow (SURVEY.md §3.1, shuffles labeled):

  pending scan (partition-pruned on status)             [no shuffle]
  → R2 robots gate (broadcast join + array HOF, zero-shuffle —
    rules were prefetched by init_run / the previous epoch, so R1
    never sits on the epoch critical path)
  → politeness k (broadcast join budgets)
  → F5 salted two-stage window-rank pop                 [shuffle 1: (host,salt); shuffle 2: host (pruned)]
  → F6+X1+X2 fused fetch/parse/extract (mapInPandas)    [narrow]
  ── everything below overlaps on one thread pool ──
  → C1 canonicalize outlinks + intra-epoch dedup window [shuffle 3: url_hash]
  → D1 bloom probe (cogrouped applyInPandas)            [shuffle 4: part_id]
  → D2 exact anti-join of maybe-seen rows vs frontier   [shuffle 5: url_hash, bloom-cut]
  → F7 touched-cell merge + insert-dir appends + D3 filter update
    + L1 lineage + R1 robots for this epoch's new hosts → staging writes
  → K1 atomic manifest commit                           [driver]

Determinism: every ordering decision reduces to the total key
(priority, depth, url_hash), so the committed tables are identical at any
parallelism — that is what the pyref-parity tests and the N-vs-4N scaling
protocol both rely on.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from engine import seen as seenmod
from engine.canonicalize import path_expr
from engine.catalog import SnapshotCatalog
from engine.fetch import fetch_parse
from engine.frontier import pop_frontier, retry_transition
from engine.lineage import partition_lineage, write_metrics_parquet
from engine.parse import extract_candidates
from engine.robots import fetch_robots, robots_gate
from engine.schemas import (
    FETCHED_STAGED,
    FRONTIER,
    POLITENESS_BUDGETS,
    ROBOTS_RULES,
)
from engine.seed import seeds_to_frontier
from engine.synthgraph import GraphConfig, gen_budgets


class CrawlEngine:
    """Spark-native crawl engine over snapshot-versioned (Iceberg-role) tables."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cfg: GraphConfig,
        *,
        n_buckets: int = 64,
        n_filter_parts: int = 16,
        salt: int = 16,
        filter_nbits: int = seenmod.DEFAULT_NBITS,
        filter_nhash: int = seenmod.DEFAULT_NHASH,
        use_robots: bool = True,
        use_seen_filter: bool = True,
        default_k: int = 1,
        partition_frontier_by_status: bool = True,  # retained arg: cells always partition by (status, host_bucket) now
        bench_budget: int | None = None,
        filter_kind: str = "bloom",
        max_cell_dirs: int = 16,
    ):
        self.spark = spark
        self.cfg = cfg
        self.n_buckets = n_buckets
        self.n_filter_parts = n_filter_parts
        self.salt = salt
        self.filter_nbits = filter_nbits
        self.filter_nhash = filter_nhash
        self.use_robots = use_robots
        self.use_seen_filter = use_seen_filter
        self.default_k = default_k
        self.bench_budget = bench_budget
        self.filter_kind = filter_kind
        self.max_cell_dirs = max_cell_dirs
        self.catalog = SnapshotCatalog(spark, root)
        self._budgets: DataFrame | None = None  # cross-epoch cache (immutable dim)

    # ------------------------------------------------------------------ init
    def init_run(self, seeds: list[str] | None = None, seed_path: str | None = None) -> None:
        """Epoch-0 commit: frontier from seeds, budgets, seed-host robots, filter."""
        cat = self.catalog
        if self._budgets is not None:
            self._budgets.unpersist()
            self._budgets = None
        frontier = seeds_to_frontier(self.spark, seeds, self.n_buckets, seed_path)
        fr_path = cat.stage_path(0, "frontier")
        cells = self._write_bucket_cells(frontier, os.path.join(fr_path, "pending"))
        parts0 = {cat.cell_key("pending", b): [p] for b, p in cells.items()}
        frontier = cat.read_parts(parts0)

        # bench_budget: uniform politeness budget for throughput benches
        # (politeness *semantics* are identical; only the k value changes,
        # so oracle-parity configs must leave this None)
        rows = (
            [(h, self.bench_budget, 0.0) for h, _, _ in gen_budgets(self.cfg)]
            if self.bench_budget is not None
            else gen_budgets(self.cfg)
        )
        budgets = self.spark.createDataFrame(rows, POLITENESS_BUDGETS)
        bud_path = cat.stage_path(0, "politeness_budgets")
        self._write(budgets, bud_path)

        # R1 prefetch: rules for the SEED hosts are acquired at init, and
        # every later epoch acquires rules for its INSERT hosts as part of
        # that epoch's overlapped writes — so no epoch ever starts with a
        # synchronous missing-rules job on its critical path.  Invariant
        # (meta "robots_complete"): the committed robots table covers every
        # host that has ever held a frontier row, which is a superset of
        # the hosts any pending scan can produce — the R2 gate never sees
        # a rule-less host.
        rob_path = cat.stage_path(0, "robots_rules")
        if self.use_robots:
            seed_hosts = frontier.select("host").distinct()
            rules = fetch_robots(seed_hosts, self.cfg, 0).persist()
            n_rules = rules.count()
            self._write(rules, rob_path)
            rules.unpersist()
        else:
            n_rules = 0
            self._write(self.spark.createDataFrame([], ROBOTS_RULES), rob_path)

        n_frontier = frontier.count()
        snapshots = {
            "frontier": {"rows": n_frontier, "parts": parts0},
            "politeness_budgets": {"path": bud_path, "rows": budgets.count()},
            "robots_rules": {"paths": [rob_path], "rows": n_rules},
        }
        if self.use_seen_filter:
            blobs = seenmod.init_filter(
                self.spark,
                frontier.select("url_hash"),
                self.n_filter_parts,
                self.filter_nbits,
                self.filter_nhash,
                kind=self.filter_kind,
            )
            sf_path = cat.stage_path(0, "seen_filter")
            self._write(blobs, sf_path)
            snapshots["seen_filter"] = {"path": sf_path, "rows": self.n_filter_parts}
        cat.commit(
            0,
            snapshots,
            appends={},
            meta={
                "cfg": repr(self.cfg),
                # tracked state: lets epochs derive frontier/pending counts
                # arithmetically instead of re-scanning the table (at
                # 10^10-URL scale the full-frontier count is a job over
                # millions of file footers — the invariant is free)
                "frontier_rows": n_frontier,
                "pending": n_frontier,
                "robots_rows": n_rules,
                # only a robots-ON run can vouch coverage; a robots-off
                # history must NOT skip the bootstrap fetch when the catalog
                # is later re-opened with robots enabled (hosts discovered
                # during robots-off epochs have no committed rules)
                "robots_complete": self.use_robots,
            },
        )

    # ----------------------------------------------------------------- epoch
    def run_epoch(self, epoch: int) -> dict:
        t0 = time.time()
        _ph, _tp = {}, [time.time()]

        def _mark(name: str) -> None:
            # phase wall-clock profile, printed when SPARK_GRAFT_EPOCH_TIMING
            # is set — the scaling harness uses it to attribute the
            # non-scaling fraction of an epoch to a concrete stage
            now = time.time()
            _ph[name] = round(now - _tp[0], 2)
            _tp[0] = now

        def _timed(name: str, fn, *args):
            # per-future (start, dur) relative to epoch t0: shows which
            # concurrent job is the overlap window's straggler
            def wrapped():
                s = time.time()
                try:
                    return fn(*args)
                finally:
                    _ph.setdefault("futures", {})[name] = (
                        round(s - t0, 2),
                        round(time.time() - s, 2),
                    )

            return wrapped

        spark, cat, cfg = self.spark, self.catalog, self.cfg
        if self._budgets is None:
            # politeness budgets are immutable after init: cache the tiny
            # per-host dim across epochs instead of re-reading parquet
            self._budgets = cat.read_snapshot("politeness_budgets").persist()
        budgets = self._budgets
        prev_epoch = cat.last_epoch()
        prev_manifest = cat.manifest(prev_epoch)
        prev_meta = prev_manifest.get("meta", {})
        prev_rows = prev_meta.get("frontier_rows")
        prev_pending = prev_meta.get("pending")
        prev_robots_rows = prev_meta.get("robots_rows")

        # SC3 scan prune: with a cell-granular snapshot the pending scan is
        # pruned at the MANIFEST — terminal (done/failed/disallowed) cells
        # are never even listed, let alone read.  Legacy whole-table
        # snapshots fall back to a status filter (and are migrated to cells
        # by this epoch's commit).
        parts = prev_manifest["snapshots"]["frontier"].get("parts")
        if parts is not None:
            frontier = cat.read_parts(parts, schema=FRONTIER)
            pending = cat.read_parts(parts, status="pending", schema=FRONTIER)
            if pending is None:
                pending = spark.createDataFrame([], FRONTIER)
        else:
            frontier = cat.read_snapshot("frontier")
            pending = frontier.where(F.col("status") == "pending")

        # --- R2 gate; R1 ran AHEAD (init_run / previous epoch's overlap) ---
        # The committed robots table already covers every host that has
        # ever held a frontier row (meta "robots_complete" invariant), so
        # the epoch start needs NO synchronous rules job — the one-time
        # acquisition for this epoch's newly-discovered hosts runs below,
        # overlapped with the writes.
        robots = None
        robots_paths: list[str] = []
        orig_robots_paths: list[str] = []
        if self.use_robots:
            entry = prev_manifest["snapshots"]["robots_rules"]
            robots_paths = list(entry.get("paths") or [entry["path"]])
            orig_robots_paths = list(robots_paths)
            robots = spark.read.schema(ROBOTS_RULES).parquet(*robots_paths)
            if not prev_meta.get("robots_complete"):
                # legacy catalog (manifests committed before the prefetch
                # invariant): acquire rules for pending hosts synchronously
                # ONCE; this commit marks the invariant, later epochs stay
                # on the fast path.  persist-before-count: a real fetcher is
                # non-deterministic, the counted rows must be the written rows
                missing = pending.select("host").distinct().join(
                    robots.select("host").distinct(), "host", "left_anti"
                )
                boot = fetch_robots(missing, cfg, epoch).persist()
                n_boot = boot.count()
                if prev_robots_rows is None:
                    prev_robots_rows = robots.count()
                if n_boot:
                    boot_path = os.path.join(
                        cat.stage_path(epoch, "robots_rules"), "bootstrap"
                    )
                    self._write(boot, boot_path)
                    robots_paths.append(boot_path)
                    robots = spark.read.schema(ROBOTS_RULES).parquet(*robots_paths)
                    prev_robots_rows += n_boot
                boot.unpersist()
            gated = robots_gate(pending.withColumn("path", path_expr()), robots).drop("path")
        else:
            gated = pending.withColumn("allowed", F.lit(True))
        gated = gated.persist()
        _mark("gate_build")
        disallowed = gated.where(~F.col("allowed"))
        eligible = gated.where(F.col("allowed"))

        # --- politeness k + F5 pop ---
        # effective k = logical budget ∧ delay cap: a host with
        # min_delay_s = d > 0 fits only floor(epoch_window_s/d)+1 fetches
        # in the epoch's logical window (same rule as pyref/oracle.py and
        # synthgraph.delay_cap — floor division on doubles in both).
        delay_cap_expr = F.when(
            F.col("min_delay_s") > 0,
            (F.floor(F.lit(cfg.epoch_window_s) / F.col("min_delay_s")) + 1).cast("int"),
        ).otherwise(F.lit((1 << 31) - 1))
        elig_k = (
            eligible.join(
                F.broadcast(
                    budgets.select(
                        "host",
                        F.col("max_fetches_per_epoch").alias("k"),
                        "min_delay_s",
                    )
                ),
                "host",
                "left",
            )
            .fillna({"k": self.default_k, "min_delay_s": 0.0})
            .withColumn("k", F.least(F.col("k"), delay_cap_expr))
        )
        popped = pop_frontier(elig_k, self.salt).persist()
        # Materialize each persisted stage ONCE, in dependency order, before
        # anything downstream references it from multiple branches.  Without
        # this, the first write action recomputes the whole lazy chain
        # (pandas-UDF fetch included) once per branch — measured 98s vs 5s
        # for the frontier write at 8k pops.  The counts double as metrics;
        # popped/gated caches are populated by the fetch-stats job below.
        crawl_log = popped.select(
            F.lit(epoch).cast("int").alias("epoch"),
            "host",
            "fetch_seq_in_host",
            "url",
            "url_hash",
        )
        # the pool opens BEFORE the fetch write so the (cheap) crawl_log
        # write overlaps it: both consume the popped cache, whose block
        # locks make the first job compute each partition and the other
        # reuse it — one fewer job serialized into the epoch tail
        pool = ThreadPoolExecutor(max_workers=10)
        crawl_log_path = cat.stage_path(epoch, "crawl_log")
        fut_crawl_log = pool.submit(_timed("crawl_log", self._write, crawl_log, crawl_log_path))

        # --- F6/X1/X2 ---
        # Materialize the fetch output ONCE as a staged parquet table
        # instead of a DISK_ONLY cache.  Rationale (the 100 TB shape): a
        # cached row is monolithic — every downstream consumer (stats agg,
        # candidate extraction, retry transition, lineage) deserializes the
        # spans payload it never uses — whereas a parquet scan prunes to
        # the columns each consumer reads.  The fat spans column is written
        # exactly once (Python → Arrow → parquet) and never read again this
        # epoch: the committed ``documents`` append IS the ok=1 cells of
        # this directory (zero-copy publish; extra engine columns on the
        # documents table are allowed, SURVEY.md §1.2).  ``okp`` is an int
        # partition column (hive partition inference has no boolean type),
        # so the failed-row consumers prune to the tiny okp=0 cells.
        bucket_of_host = F.pmod(F.xxhash64("host"), F.lit(self.n_buckets)).cast("int")
        fetched_dir = cat.stage_path(epoch, "fetched")
        self._write(
            fetch_parse(popped, cfg)
            .withColumn("okp", F.col("ok").cast("int"))
            .withColumn("doc_id", F.col("url"))
            .withColumn("epoch", F.lit(epoch).cast("int"))
            .withColumn(
                "n_outlinks", F.coalesce(F.size("outlinks"), F.lit(0)).cast("int")
            )
            .withColumn("host_bucket", bucket_of_host),
            fetched_dir,
            partition_cols=["okp"],
        )
        fetched = spark.read.schema(FETCHED_STAGED).parquet(fetched_dir)
        retryable = (~F.col("ok")) & (F.col("retries") + 1 < F.lit(cfg.max_retries))
        _mark("fetch_write")

        # --- everything after the fetch write overlaps on one pool ---
        # Every remaining epoch output derives only from materialized state
        # (the gated/popped caches the fetch write populated, the staged
        # fetched parquet, or the flagged cache below), so the stat jobs and
        # write jobs are mutually independent and run concurrently.  This
        # overlaps per-job driver latency (Catalyst analysis, scheduling,
        # file-commit protocol) that otherwise serializes ~8 jobs per epoch
        # — the constant cost that caps N->4N scaling efficiency on fast
        # epochs.  Atomicity is untouched: nothing is visible until the
        # manifest rename below, and a failure in ANY job aborts the epoch
        # before commit (futures re-raise at the gather).
        # fetch metrics + popped host_bucket set: one job over slim int
        # columns of the staged parquet (spans never deserialized)
        fut_fetch_stats = pool.submit(_timed(
            "fetch_stats",
            lambda: fetched.agg(
                F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
                F.count(F.when(~F.col("ok"), 1)).alias("n_fail"),
                F.count(F.when(retryable, 1)).alias("n_retry_pending"),
                F.coalesce(
                    F.sum(F.when(F.col("ok"), F.col("n_outlinks"))), F.lit(0)
                ).alias("links"),
                F.collect_set("host_bucket").alias("bks"),
            ).collect()[0],
        ))
        fut_dis = pool.submit(_timed(
            "dis_stats",
            lambda: disallowed.agg(
                F.count("*").alias("n"), F.collect_set("host_bucket").alias("bks")
            ).collect()[0],
        ))

        # --- D1/D2 ---
        cands = extract_candidates(
            fetched.where(F.col("okp") == 1), cfg, self.n_buckets
        )
        frontier_keys = frontier.select("url_hash")
        if self.use_seen_filter:
            seen = cat.read_snapshot("seen_filter")
            # slim strategy: Arrow-crosses 16 bytes/candidate (hash only)
            # instead of the full URL-carrying row, and its url_hash
            # join-back exchange is the same one flag_new needs.  The
            # 'broadcast' JVM strategy is measurably WORSE at the default
            # blob size (engine/seen.py probe_filter docstring) — kept for
            # small-blob configs only.
            probed = seenmod.probe_filter(
                cands, seen, self.n_filter_parts, strategy="slim", key_unique=True
            )
            flagged = seenmod.flag_new(probed, frontier_keys).persist()
        else:
            seen = None
            # dropDuplicates for the same duplicate-immunity as
            # seen.flag_new (left join ≡ left_anti only under key-unique
            # marker; the dedup reuses the join's url_hash exchange)
            marker = frontier_keys.dropDuplicates().withColumn("_seen", F.lit(True))
            flagged = (
                cands.join(marker, "url_hash", "left")
                .withColumn("is_new", F.col("_seen").isNull())
                .drop("_seen")
                .persist()
            )
        # candidate + insert counts ride the insert write as observation
        # metrics (CollectMetrics above the is_new filter) instead of a
        # dedicated agg job — one fewer full pass over the flagged cache
        # in the epoch tail.  ``Observation.get`` is resolved at the
        # gather, after the write job (or the seen-filter update, which
        # executes the same subtree) has fired it.
        ins_obs = Observation(f"ins_stats_e{epoch}")
        cols = [f.name for f in FRONTIER.fields]
        inserts = flagged.observe(
            ins_obs,
            F.count(F.lit(1)).alias("n_cands"),
            F.count(F.when(F.col("is_new"), 1)).alias("n"),
        ).where("is_new").select(
            "url_hash",
            "url",
            "host",
            "host_bucket",
            "depth",
            F.col("depth").cast("double").alias("priority"),
            F.lit(epoch).cast("int").alias("discovered_epoch"),
            F.lit("pending").alias("status"),
            F.lit(0).cast("int").alias("retries"),
            "parent_hash",
        )
        fr_dir = cat.stage_path(epoch, "frontier")
        # F7 inserts: written as APPENDED per-bucket dirs under their
        # pending cells — a pending cell whose rows were not popped or
        # disallowed this epoch is never read OR rewritten for an insert
        # (true O(delta): the r02 form still rewrote insert-only cells).
        # Fragmentation is bounded by _compact_cells below.
        fut_insert_cells = pool.submit(_timed(
            "insert_cells",
            self._write_bucket_cells,
            inserts.select(*cols),
            os.path.join(fr_dir, "inserts"),
        ))

        # --- D3 filter update ---
        def write_seen() -> str:
            new_blobs = seenmod.update_filter(
                seen, inserts.select("url_hash"), self.n_filter_parts, epoch
            )
            sf_path = cat.stage_path(epoch, "seen_filter")
            self._write(new_blobs, sf_path)
            return sf_path

        fut_seen = pool.submit(_timed("seen", write_seen)) if self.use_seen_filter else None

        # --- R1 for NEXT epoch's gate: rules for hosts first discovered by
        # this epoch's inserts, committed with this epoch (the
        # robots_complete invariant) ---
        def robots_delta() -> tuple[int | None, list[str] | None]:
            if not self.use_robots:
                return prev_robots_rows, None
            new_hosts = (
                flagged.where("is_new")
                .select("host")
                .distinct()
                .join(robots.select("host").distinct(), "host", "left_anti")
            )
            delta = fetch_robots(new_hosts, cfg, epoch).persist()
            n = delta.count()
            if not n:
                delta.unpersist()
                return prev_robots_rows, None
            dpath = os.path.join(cat.stage_path(epoch, "robots_rules"), "delta")
            self._write(delta, dpath)
            delta.unpersist()
            paths = robots_paths + [dpath]
            if len(paths) > self.max_cell_dirs:
                cpath = os.path.join(cat.stage_path(epoch, "robots_rules"), "compact")
                self._write(spark.read.schema(ROBOTS_RULES).parquet(*paths), cpath)
                paths = [cpath]
            base = prev_robots_rows if prev_robots_rows is not None else 0
            return base + n, paths

        fut_robots = pool.submit(_timed("robots_delta", robots_delta))

        # --- L1 lineage ---
        # Audits the COMMITTED layout: per-stage row counts are taken from
        # the staged parquet each stage wrote (column-less count scans —
        # parquet metadata, not data pages) instead of re-scanning the
        # popped/flagged caches.  This removes two full cache passes from
        # the tail; the job waits on the two writes it audits, both of
        # which it overlaps with the merge/seen/robots work.
        in_snap, out_snap = f"epoch={epoch - 1}", f"epoch={epoch}"
        lineage_path = cat.stage_path(epoch, "lineage")

        def write_lineage() -> None:
            fut_crawl_log.result()
            cell_paths = list(fut_insert_cells.result().values())
            lineage = partition_lineage(
                spark.read.parquet(crawl_log_path), epoch, "pop", in_snap, out_snap
            ).unionByName(
                partition_lineage(fetched, epoch, "fetch_parse", in_snap, out_snap)
            )
            if cell_paths:
                lineage = lineage.unionByName(
                    partition_lineage(
                        spark.read.schema(FRONTIER).parquet(*cell_paths),
                        epoch,
                        "dedup_insert",
                        in_snap,
                        out_snap,
                    )
                )
            self._write(lineage.coalesce(1), lineage_path)

        fut_lineage = pool.submit(_timed("lineage", write_lineage))

        # --- F7 merge of TOUCHED pending cells (cell-granular, O(delta)) ---
        # Only cells holding popped/disallowed rows are rewritten; rows
        # leaving 'pending' are APPENDED as new immutable dirs under their
        # terminal cell, which is never rewritten — the manifest-level
        # analogue of Iceberg MERGE INTO's add/remove-file commit
        # (engine/catalog.py SC6 notes).  Runs on the pool too: it needs
        # only the two stat futures above, so it overlaps the probe/flag
        # chain and every other write.
        updates = retry_transition(fetched, cfg.max_retries).unionByName(
            disallowed.select(
                "url_hash",
                F.lit("disallowed").alias("new_status"),
                F.col("retries").alias("new_retries"),
                F.lit(None).cast("double").alias("new_priority"),
            )
        )

        def write_merged() -> tuple[dict, dict, dict]:
            st, ds = fut_fetch_stats.result(), fut_dis.result()
            touched = set(
                b for b in set(st["bks"]) | set(ds["bks"]) if b is not None
            )
            carry_cells: dict = {}
            if parts is None:
                # one-time migration of a legacy whole-table snapshot to cells
                pending_src = frontier.where(
                    (F.col("status") == "pending") & F.col("host_bucket").isin(touched)
                )
                legacy_carry = frontier.where(
                    (F.col("status") != "pending") | ~F.col("host_bucket").isin(touched)
                ).select(*cols)
                base: dict = {}
            else:
                pending_src = cat.read_parts(
                    parts, status="pending", buckets=touched, schema=FRONTIER
                )
                if pending_src is None:
                    pending_src = spark.createDataFrame([], FRONTIER)
                legacy_carry = None
                base = {
                    cell: list(dirs)
                    for cell, dirs in parts.items()
                    if not (cell.startswith("pending/") and int(cell.split("/")[1]) in touched)
                }
            merged = (
                pending_src.select(*cols)
                .join(updates, "url_hash", "left")
                .withColumn("status", F.coalesce(F.col("new_status"), F.col("status")))
                .withColumn("retries", F.coalesce(F.col("new_retries"), F.col("retries")))
                .withColumn("priority", F.coalesce(F.col("new_priority"), F.col("priority")))
                .drop("new_status", "new_retries", "new_priority")
            )
            cells = self._write_status_cells(merged, os.path.join(fr_dir, "cells"))
            if legacy_carry is not None:
                carry_cells = self._write_status_cells(
                    legacy_carry, os.path.join(fr_dir, "carry")
                )
            return base, cells, carry_cells

        fut_merged = pool.submit(_timed("merged", write_merged))

        # --- gather (any failure aborts before commit) ---
        try:
            stats = fut_fetch_stats.result()
            dis_stats = fut_dis.result()
            base_parts, merged_cells, carry_cells = fut_merged.result()
            insert_cells = fut_insert_cells.result()
            ins_stats = ins_obs.get  # fired by the insert_cells write job
            fut_crawl_log.result()
            fut_lineage.result()
            n_robots_rows, new_robots_paths = fut_robots.result()
            sf_path = fut_seen.result() if fut_seen is not None else None
        finally:
            pool.shutdown(wait=True)
        _mark("overlap_stats_writes")

        n_ok, n_fail = int(stats["n_ok"]), int(stats["n_fail"])
        n_retry_pending, n_links = int(stats["n_retry_pending"]), int(stats["links"])
        n_popped = n_ok + n_fail
        n_disallowed = int(dis_stats["n"])
        n_cands, n_new = int(ins_stats["n_cands"]), int(ins_stats["n"])

        # assemble the cell map deterministically on the main thread:
        # rewritten pending cells REPLACE their dir list, terminal/carry
        # dirs and insert dirs APPEND
        new_parts = dict(base_parts)
        for (st, b), p in merged_cells.items():
            if st == "pending":
                new_parts[cat.cell_key("pending", b)] = [p]
            else:
                new_parts.setdefault(cat.cell_key(st, b), []).append(p)
        for (st, b), p in carry_cells.items():
            new_parts.setdefault(cat.cell_key(st, b), []).append(p)
        for b, p in insert_cells.items():
            new_parts.setdefault(cat.cell_key("pending", b), []).append(p)
        new_parts = self._compact_cells(new_parts, fr_dir)

        appends: dict = {
            # documents needs NO job at all: the append entry points at the
            # okp=1 cells of the already-written fetched staging dir (doc_id
            # / spans / url / host / epoch are in the files; the extra
            # engine columns ride along, nullable-allowed per SURVEY.md §1.2)
            "documents": {"path": os.path.join(fetched_dir, "okp=1"), "rows": n_ok},
            "crawl_log": {"path": crawl_log_path, "rows": n_popped},
            "lineage": {"path": lineage_path, "rows": 1},
        }
        snapshots: dict = {}
        if sf_path is not None:
            snapshots["seen_filter"] = {"path": sf_path, "rows": self.n_filter_parts}
        if new_robots_paths is not None:
            snapshots["robots_rules"] = {"paths": new_robots_paths, "rows": n_robots_rows}
        elif self.use_robots and robots_paths != orig_robots_paths:
            # legacy bootstrap extended the committed dirs but no insert
            # delta followed — still must commit the bootstrap dir
            snapshots["robots_rules"] = {"paths": robots_paths, "rows": n_robots_rows}
        _mark("assemble")

        # --- metrics (definitions shared with pyref.oracle) ---
        # pending_end and frontier_rows follow arithmetically from the
        # status-transition semantics (every popped row leaves 'pending'
        # and only retryable failures re-enter; inserts are all pending),
        # so no post-write table scan is needed.  Falls back to counting
        # for catalogs committed before this invariant was tracked.
        frontier_rows = (prev_rows + n_new) if prev_rows is not None else None
        if prev_pending is not None:
            pending_end = (
                prev_pending - n_popped - n_disallowed + n_retry_pending + n_new
            )
        else:
            committed_pending = cat.read_parts(new_parts, status="pending")
            pending_end = committed_pending.count() if committed_pending is not None else 0
            frontier_rows = cat.read_parts(new_parts).count()
        wall = time.time() - t0
        metrics = {
            "urls_popped": n_popped,
            "urls_fetch_ok": n_ok,
            "urls_fetch_fail": n_fail,
            "docs_parsed": n_ok,
            "outlinks_extracted": n_links,
            "outlinks_candidates": n_cands,
            "outlinks_new": n_new,
            "disallowed": n_disallowed,
            "pending_end": pending_end,
            "wall_ms": wall * 1000.0,
            "urls_per_sec": (n_popped / wall) if wall > 0 else 0.0,
        }
        # metrics are driver-resident scalars: write the parquet directly via
        # pyarrow — zero Spark jobs, same schema as engine.schemas.METRICS
        mpath = cat.stage_path(epoch, "metrics")
        write_metrics_parquet(mpath, epoch, metrics)
        appends["metrics"] = {"path": mpath, "rows": len(metrics)}

        # --- K1 atomic commit ---
        snapshots["frontier"] = {"rows": frontier_rows, "parts": new_parts}
        cat.commit(
            epoch,
            snapshots,
            appends,
            meta={
                "metrics": metrics,
                "frontier_rows": frontier_rows,
                "pending": pending_end,
                "robots_rows": n_robots_rows,
                "robots_complete": self.use_robots,
            },
        )

        for df in (gated, popped, flagged):
            df.unpersist()
        _mark("commit")
        if os.environ.get("SPARK_GRAFT_EPOCH_TIMING"):
            import json as _json
            import sys as _sys

            print(
                _json.dumps({"epoch": epoch, "phases_s": _ph}),
                file=_sys.stderr,
                flush=True,
            )
        return metrics

    # ------------------------------------------------------------------- run
    def run(self, max_epochs: int, seeds: list[str] | None = None, resume: bool = False) -> list[dict]:
        """Full crawl: init (or resume) then epoch loop until drained."""
        if resume:
            self.catalog.discard_uncommitted()
            if self.catalog.last_epoch() is None:
                self.init_run(seeds)
        else:
            self.init_run(seeds)
        start = self.catalog.last_epoch() + 1
        out = []
        for epoch in range(start, max_epochs + 1):
            m = self.run_epoch(epoch)
            out.append(m)
            if m["pending_end"] == 0:
                break
        return out

    # ---------------------------------------------------------------- helpers
    def _compact_cells(self, new_parts: dict, fr_dir: str) -> dict:
        """Bound cell fragmentation: a terminal cell accumulates one appended
        dir per epoch that touches it; past ``max_cell_dirs`` the cell is
        rewritten into a single dir (Iceberg's rewrite_data_files analogue).
        Amortized cost stays O(delta): each row is rewritten at most once
        per max_cell_dirs epochs."""
        frag = {c: d for c, d in new_parts.items() if len(d) > self.max_cell_dirs}
        if not frag:
            return new_parts
        df = self.spark.read.parquet(*[p for dirs in frag.values() for p in dirs])
        out = dict(new_parts)
        for cell in frag:
            del out[cell]
        for (st, b), p in self._write_status_cells(
            df, os.path.join(fr_dir, "compact")
        ).items():
            out[self.catalog.cell_key(st, b)] = [p]
        return out

    @staticmethod
    def _write(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)

    @staticmethod
    def _write_bucket_cells(df: DataFrame, path: str) -> dict[int, str]:
        """Write pending rows as one leaf dir per host_bucket cell.

        The ``_hb`` duplicate keeps host_bucket IN the data files (a hive
        leaf dir read directly would otherwise lose its partition column);
        repartition on it yields exactly one file per cell instead of
        tasks × cells.  Returns {bucket: leaf_dir}.
        """
        (
            df.withColumn("_hb", F.col("host_bucket"))
            .repartition("_hb")
            .write.mode("overwrite")
            .partitionBy("_hb")
            .parquet(path)
        )
        return {
            int(d.split("=")[1]): os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("_hb=")
        }

    @staticmethod
    def _write_status_cells(df: DataFrame, path: str) -> dict[tuple[str, int], str]:
        """Write rows leaving 'pending' as (status, host_bucket) leaf dirs —
        these get APPENDED to their terminal cells, which are never
        rewritten.  Returns {(status, bucket): leaf_dir}."""
        (
            df.withColumn("_st", F.col("status"))
            .withColumn("_hb", F.col("host_bucket"))
            .repartition("_st", "_hb")
            .write.mode("overwrite")
            .partitionBy("_st", "_hb")
            .parquet(path)
        )
        out: dict[tuple[str, int], str] = {}
        for d_st in os.listdir(path):
            if not d_st.startswith("_st="):
                continue
            st = d_st.split("=")[1]
            for d_hb in os.listdir(os.path.join(path, d_st)):
                if d_hb.startswith("_hb="):
                    out[(st, int(d_hb.split("=")[1]))] = os.path.join(path, d_st, d_hb)
        return out
