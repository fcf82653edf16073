"""min_delay_s politeness semantics under NONZERO delays (VERDICT r02 #6).

Logical-time model (engine/synthgraph.py GraphConfig): an epoch is a window
of ``epoch_window_s`` seconds; a host with min_delay_s = d > 0 fetches at
t = 0, d, 2d, ..., so its effective per-epoch budget is
min(max_fetches_per_epoch, floor(window/d) + 1).  The engine applies the
cap as a Spark expression at pop time (engine/crawl.py delay_cap_expr);
the pyref oracle applies synthgraph.delay_cap.  These tests pin:

  * crawl ordering / URL-seen / metrics parity vs pyref with delays that
    genuinely BIND (cap < budget for some hosts — asserted, not assumed);
  * the politeness property ∀(host, epoch): fetches <= min(budget, cap);
  * the in-batch fetch_at_s schedule: fetch_seq_in_host * min_delay_s,
    always inside the epoch window.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from engine.synthgraph import (
    GraphConfig,
    budget_for_host,
    delay_cap,
    gen_seed_urls,
    min_delay_for_host,
)
from pyref.oracle import run_crawl as oracle_run
from tests.conftest import run_engine

DELAY_CFG = GraphConfig(
    n_hosts=20, max_pages=50, max_depth=3, delay_mod=8, epoch_window_s=10.0
)


@pytest.fixture(scope="module")
def delay_seeds():
    return gen_seed_urls(DELAY_CFG)


@pytest.fixture(scope="module")
def delay_oracle(delay_seeds):
    return oracle_run(delay_seeds, DELAY_CFG, max_epochs=4)


@pytest.fixture(scope="module")
def delay_engine(spark, tmp_path_factory, delay_seeds):
    root = tmp_path_factory.mktemp("crawl_delay")
    eng, metrics = run_engine(spark, root, DELAY_CFG, delay_seeds, max_epochs=4)
    return eng, metrics


def _host(h: int) -> str:
    return f"host{h:04d}.example"


def test_delays_actually_bind():
    """Fixture sanity: the cap must beat the budget for >=1 host, else the
    parity tests below would pass vacuously with delay-cap code deleted."""
    binding = [
        h
        for h in range(DELAY_CFG.n_hosts)
        if delay_cap(
            min_delay_for_host(_host(h), DELAY_CFG), DELAY_CFG.epoch_window_s
        )
        < budget_for_host(_host(h))
    ]
    assert binding, "delay fixture never binds — raise delay_mod or shrink window"


def test_crawl_order_parity_with_delays(delay_engine, delay_oracle):
    eng, _ = delay_engine
    got = sorted(
        (r["epoch"], r["host"], r["fetch_seq_in_host"], r["url"], r["url_hash"])
        for r in eng.catalog.read_appended("crawl_log").collect()
    )
    assert got == sorted(delay_oracle.crawl_log)


def test_seen_set_parity_with_delays(delay_engine, delay_oracle):
    eng, _ = delay_engine
    got = {
        r["url_hash"]
        for r in eng.catalog.read_snapshot("frontier").select("url_hash").collect()
    }
    assert got == delay_oracle.seen_set


def test_metrics_parity_with_delays(delay_engine, delay_oracle):
    _, metrics = delay_engine
    for got, want in zip(metrics, delay_oracle.metrics):
        for k in ("urls_popped", "outlinks_new", "pending_end", "disallowed"):
            assert got[k] == want[k], k


def test_politeness_never_exceeded(delay_engine):
    eng, _ = delay_engine
    per = Counter()
    for r in eng.catalog.read_appended("crawl_log").collect():
        per[(r["epoch"], r["host"])] += 1
    for (ep, host), n in per.items():
        k_eff = min(
            budget_for_host(host),
            delay_cap(min_delay_for_host(host, DELAY_CFG), DELAY_CFG.epoch_window_s),
        )
        assert n <= k_eff, f"epoch {ep} host {host}: {n} > {k_eff}"


def test_fetch_at_schedule_within_window(spark, delay_engine):
    """fetch_at_s = fetch_seq_in_host * min_delay_s, computed in-batch by
    the fetcher, must stay inside the epoch window for every fetched row
    (direct unit drive of engine/fetch.py with the delay columns)."""
    from engine.fetch import fetch_parse
    from engine.seed import seeds_to_frontier

    fr = seeds_to_frontier(spark, gen_seed_urls(DELAY_CFG), n_buckets=16)
    w = F.row_number().over(Window.partitionBy("host").orderBy("url_hash"))
    popped = fr.withColumn("fetch_seq_in_host", (w - 1).cast("int")).withColumn(
        "min_delay_s", F.lit(3.0)
    )
    rows = fetch_parse(popped, DELAY_CFG).select(
        "host", "fetch_at_s", "url_hash"
    ).collect()
    seq = {}
    for r in sorted(rows, key=lambda r: (r["host"], r["fetch_at_s"])):
        i = seq.get(r["host"], 0)
        assert r["fetch_at_s"] == pytest.approx(3.0 * i)
        seq[r["host"]] = i + 1
