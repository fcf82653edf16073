"""Snapshot-versioned table catalog — K1 atomic epoch commit + K2 resume.

Iceberg ruling (SURVEY.md §0.3): no Iceberg runtime jar exists in this
sandbox, so the catalog provides the two Iceberg properties the spec uses
(BASELINE.json:6,14) without the jar:

  * **atomic multi-table commit per epoch** — every epoch's outputs are
    written under ``staging/epoch=K/<table>/`` first; the epoch becomes
    visible only via a single atomic ``os.rename`` of ``manifest-K.json``
    into ``manifests/``.  A kill at ANY point before the rename leaves the
    previous epoch as the committed state (tests/test_resume.py).
  * **time-travel / resume** — the committed state at epoch K is fully
    described by ``manifest-K.json`` (snapshot paths + append paths + row
    counts), so ``--resume`` re-reads it and continues at K+1
    (SURVEY.md §3.3).

Table kinds:
  * snapshot tables (``frontier``, ``seen_filter``, ``robots_rules``,
    ``politeness_budgets``): each epoch writes a full immutable snapshot
    dir; the manifest points at the newest.  At production scale this is
    an Iceberg ``MERGE INTO`` that rewrites only matched (status,
    host_bucket) partitions — :func:`iceberg_merge_frontier_sql` carries
    that exact statement for the jar-enabled path (SURVEY.md §2.2 SC6).
  * append tables (``documents``, ``crawl_log``, ``lineage``,
    ``metrics``): each epoch appends a new directory; a read unions all
    committed epochs' directories (parquet append sink, SC4).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_TABLES = ("frontier", "seen_filter", "robots_rules", "politeness_budgets")
APPEND_TABLES = ("documents", "crawl_log", "lineage", "metrics")


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "staging"), exist_ok=True)

    # ---- paths ----
    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, "manifests", f"manifest-{epoch:06d}.json")

    def stage_path(self, epoch: int, table: str) -> str:
        return os.path.join(self.root, "staging", f"epoch={epoch:06d}", table)

    # ---- commit / resume ----
    def last_epoch(self) -> int | None:
        names = [
            n
            for n in os.listdir(os.path.join(self.root, "manifests"))
            if n.startswith("manifest-") and n.endswith(".json")
        ]
        if not names:
            return None
        return max(int(n[len("manifest-") : -len(".json")]) for n in names)

    def manifest(self, epoch: int) -> dict:
        with open(self._manifest_path(epoch)) as f:
            return json.load(f)

    def commit(self, epoch: int, snapshots: dict, appends: dict, meta: dict | None = None) -> None:
        """Atomically publish epoch K.

        ``snapshots``/``appends``: table -> {"path": str, "rows": int}.
        Snapshot tables not written this epoch are carried forward from the
        previous manifest.  The ``os.rename`` below is the commit point.
        """
        prev = self.last_epoch()
        carried = {}
        if prev is not None:
            carried = self.manifest(prev)["snapshots"]
        merged = dict(carried)
        merged.update(snapshots)
        doc = {
            "epoch": epoch,
            "snapshots": merged,
            "appends": appends,
            "meta": meta or {},
        }
        tmp = self._manifest_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(epoch))  # THE atomic commit point

    def discard_uncommitted(self) -> None:
        """K2 resume hygiene: drop staging for any epoch beyond the last commit."""
        last = self.last_epoch()
        staging = os.path.join(self.root, "staging")
        for name in os.listdir(staging):
            if not name.startswith("epoch="):
                continue
            ep = int(name.split("=")[1])
            if last is None or ep > last:
                shutil.rmtree(os.path.join(staging, name), ignore_errors=True)

    # ---- reads (always of committed state only) ----
    def read_snapshot(self, table: str, epoch: int | None = None, schema=None) -> DataFrame:
        ep = self.last_epoch() if epoch is None else epoch
        entry = self.manifest(ep)["snapshots"][table]
        if "parts" in entry:
            return self.read_parts(entry["parts"], schema=schema)
        # "paths": append-list snapshot (robots delta dirs); "path": single dir
        paths = entry.get("paths") or [entry["path"]]
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    # ---- cell-granular snapshots (frontier) ----
    # The frontier snapshot is a dict of (status, host_bucket) CELLS, each a
    # list of immutable leaf dirs: ``parts = {"pending/3": [dir, ...]}``.
    # An epoch commit replaces only the pending cells it touched and APPENDS
    # moved-row dirs to terminal cells — the manifest-level equivalent of
    # Iceberg's add/remove-data-file commit (SC6), giving O(delta) epochs:
    # done/failed cells are never rewritten, and a pending scan prunes at
    # the MANIFEST (no file listing of terminal cells at all).

    @staticmethod
    def cell_key(status: str, bucket: int) -> str:
        return f"{status}/{bucket}"

    def frontier_parts(self, epoch: int | None = None) -> dict | None:
        """Cell map of the committed frontier, or None for a legacy
        whole-table snapshot (pre-cell catalogs; migrated on next epoch)."""
        ep = self.last_epoch() if epoch is None else epoch
        return self.manifest(ep)["snapshots"]["frontier"].get("parts")

    def read_parts(
        self,
        parts: dict,
        status: str | None = None,
        buckets: set[int] | None = None,
        schema=None,
    ) -> DataFrame | None:
        """Union of the selected cells' leaf dirs; None when no cell matches
        (caller supplies the empty frame — the catalog is schema-agnostic).
        An explicit ``schema`` skips footer-based inference — one less
        driver-side file touch per read on the per-epoch hot path."""
        paths = []
        for cell, dirs in parts.items():
            st, _, bk = cell.partition("/")
            if status is not None and st != status:
                continue
            if buckets is not None and int(bk) not in buckets:
                continue
            paths.extend(dirs)
        if not paths:
            return None
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    def read_appended(self, table: str, up_to_epoch: int | None = None) -> DataFrame | None:
        last = self.last_epoch() if up_to_epoch is None else up_to_epoch
        if last is None:
            return None
        paths = []
        for ep in range(0, last + 1):
            mp = self._manifest_path(ep)
            if not os.path.exists(mp):
                continue
            entry = self.manifest(ep)["appends"].get(table)
            if entry and entry["rows"] > 0:
                paths.append(entry["path"])
        if not paths:
            return None
        return self.spark.read.parquet(*paths)


def iceberg_merge_frontier_sql(updates_view: str = "epoch_updates", inserts_view: str = "epoch_inserts") -> list[str]:
    """Production-path Iceberg statements for the F7 frontier merge (SC6).

    Not executable in this sandbox (no iceberg-spark-runtime jar,
    SURVEY.md §0.3); kept as the exact SQL the jar-enabled deployment runs,
    unit-tested for shape in tests/test_catalog.py.  With the frontier
    Iceberg table partitioned by (status, bucket(N, host_bucket)),
    MERGE INTO rewrites only the data files whose partitions contain
    matched url_hash keys — the scan prunes on the runtime filter of the
    source's url_hash set, so the epoch touches O(delta) not O(frontier).
    """
    merge = f"""
MERGE INTO crawl.frontier t
USING {updates_view} u
ON t.url_hash = u.url_hash
WHEN MATCHED THEN UPDATE SET
  t.status = u.status, t.retries = u.retries, t.priority = u.priority
""".strip()
    insert = f"""
MERGE INTO crawl.frontier t
USING {inserts_view} s
ON t.url_hash = s.url_hash
WHEN NOT MATCHED THEN INSERT *
""".strip()
    return [merge, insert]
