"""F7 cell-granular merge: an epoch rewrites a strict subset of cells.

SURVEY.md §1.2 / §2.1-F7: the frontier snapshot is partitioned by
(status, host_bucket); epoch K's commit must (a) never rewrite a terminal
cell — rows entering done/failed/disallowed are APPENDED as new immutable
dirs — and (b) carry forward every untouched cell's dirs by identity.
This is the sandbox analogue of Iceberg MERGE INTO's O(delta) file commit.
"""

from __future__ import annotations

import pytest

from engine.crawl import CrawlEngine
from engine.synthgraph import TINY


@pytest.mark.slow
def test_terminal_cells_append_only(spark, tmp_path):
    from engine.synthgraph import gen_seed_urls

    eng = CrawlEngine(spark, str(tmp_path / "c"), TINY, n_buckets=8, n_filter_parts=4)
    eng.run(3, gen_seed_urls(TINY))
    cat = eng.catalog
    assert cat.last_epoch() >= 3

    for ep in range(2, cat.last_epoch() + 1):
        prev, cur = cat.frontier_parts(ep - 1), cat.frontier_parts(ep)
        assert prev is not None and cur is not None
        for cell, dirs in prev.items():
            st = cell.split("/")[0]
            if st == "pending":
                continue
            # terminal cell: previous dirs must survive verbatim, in order
            assert cur.get(cell, [])[: len(dirs)] == dirs, (ep, cell)
        # strict subset: at least one dir from an older epoch is reused
        reused = [
            d
            for dirs in cur.values()
            for d in dirs
            if f"epoch={ep:06d}" not in d
        ]
        assert reused, f"epoch {ep} rewrote every cell"

    # integrity: committed frontier has unique url_hash and matching count
    fr = cat.read_snapshot("frontier")
    n = fr.count()
    assert n == fr.select("url_hash").distinct().count()
    assert n == cat.manifest(cat.last_epoch())["meta"]["frontier_rows"]


@pytest.mark.slow
def test_cell_compaction_bounds_fragmentation(spark, tmp_path):
    """With max_cell_dirs=1 every fragmented cell is rewritten to a single
    dir each epoch; committed frontier content is unchanged (same rows as
    an uncompacted run)."""
    from engine.synthgraph import gen_seed_urls

    a = CrawlEngine(spark, str(tmp_path / "a"), TINY, n_buckets=8, n_filter_parts=4)
    b = CrawlEngine(
        spark, str(tmp_path / "b"), TINY, n_buckets=8, n_filter_parts=4, max_cell_dirs=1
    )
    a.run(3, gen_seed_urls(TINY))
    b.run(3, gen_seed_urls(TINY))
    for cell, dirs in b.catalog.frontier_parts().items():
        assert len(dirs) <= 1, (cell, dirs)
    rows_a = sorted(
        tuple(r) for r in a.catalog.read_snapshot("frontier").collect()
    )
    rows_b = sorted(
        tuple(r) for r in b.catalog.read_snapshot("frontier").collect()
    )
    assert rows_a == rows_b
