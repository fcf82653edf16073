"""K1/K2: kill-safety + resume-equivalence (SURVEY.md §5.5) and Q1 retry
parity on the flaky graph — run on a reduced graph to keep the suite fast."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from engine.crawl import CrawlEngine
from engine.synthgraph import GraphConfig, gen_seed_urls
from pyref.oracle import run_crawl as oracle_run

SMALL = GraphConfig(n_hosts=8, max_pages=20, max_depth=2)
FLAKY = GraphConfig(n_hosts=8, max_pages=20, max_depth=2, fail_mod=6, max_retries=2)


def _final_state(eng):
    fr = sorted(
        tuple(r) for r in eng.catalog.read_snapshot("frontier").select(
            "url_hash", "url", "status", "depth", "retries", "priority"
        ).collect()
    )
    log = sorted(tuple(r) for r in eng.catalog.read_appended("crawl_log").collect())
    docs = sorted(
        (r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in eng.catalog.read_appended("documents").collect()
    )
    return fr, log, docs


def test_resume_equals_uninterrupted(spark, tmp_path):
    seeds = gen_seed_urls(SMALL)
    # uninterrupted 3-epoch run
    eng_a = CrawlEngine(spark, str(tmp_path / "a"), SMALL, n_filter_parts=4, salt=4)
    eng_a.run(3, seeds=seeds)
    # interrupted: 2 epochs, then a NEW engine instance resumes to 3 with
    # junk staging simulating a mid-epoch kill before commit
    eng_b1 = CrawlEngine(spark, str(tmp_path / "b"), SMALL, n_filter_parts=4, salt=4)
    eng_b1.run(2, seeds=seeds)
    junk = tmp_path / "b" / "staging" / "epoch=000003" / "frontier"
    junk.mkdir(parents=True)
    (junk / "part-junk.parquet").write_bytes(b"not parquet")
    eng_b2 = CrawlEngine(spark, str(tmp_path / "b"), SMALL, n_filter_parts=4, salt=4)
    eng_b2.run(3, seeds=seeds, resume=True)
    assert _final_state(eng_a) == _final_state(eng_b2)


def test_flaky_retry_parity(spark, tmp_path):
    """Q1: deterministic failures/retries match the oracle exactly."""
    seeds = gen_seed_urls(FLAKY)
    eng = CrawlEngine(spark, str(tmp_path / "f"), FLAKY, n_filter_parts=4, salt=4)
    eng.run(3, seeds=seeds)
    want = oracle_run(seeds, FLAKY, max_epochs=3)
    got_log = sorted(
        (r["epoch"], r["host"], r["fetch_seq_in_host"], r["url"], r["url_hash"])
        for r in eng.catalog.read_appended("crawl_log").collect()
    )
    assert got_log == sorted(want.crawl_log)
    got_status = {
        r["url_hash"]: (r["status"], r["retries"])
        for r in eng.catalog.read_snapshot("frontier").collect()
    }
    want_status = {h: (rec.status, rec.retries) for h, rec in want.frontier.items()}
    assert got_status == want_status
    assert any(s == "failed" or r > 0 for s, r in want_status.values()), "fixture must exercise retries"


def test_politeness_never_exceeded(spark, tmp_path):
    """Property (§5.4): ∀ (host, epoch): fetches ≤ max_fetches_per_epoch."""
    from engine.synthgraph import budget_for_host

    seeds = gen_seed_urls(SMALL)
    eng = CrawlEngine(spark, str(tmp_path / "p"), SMALL, n_filter_parts=4, salt=4)
    eng.run(3, seeds=seeds)
    counts = (
        eng.catalog.read_appended("crawl_log")
        .groupBy("epoch", "host")
        .agg(F.count("*").alias("n"), F.max("fetch_seq_in_host").alias("mx"))
        .collect()
    )
    for r in counts:
        k = budget_for_host(r["host"])
        assert r["n"] <= k, f"{r['host']} epoch {r['epoch']}: {r['n']} > {k}"
        assert r["mx"] == r["n"] - 1  # dense 0-based sequence


def test_robots_off_history_bootstraps_on_reopen(spark, tmp_path):
    """A robots-off history must NOT vouch robots coverage: re-opening the
    catalog with robots enabled has to take the bootstrap fetch for hosts
    discovered during the robots-off epochs (regression: ``robots_complete``
    was committed True unconditionally, silently default-allowing them)."""
    seeds = gen_seed_urls(SMALL)
    root = str(tmp_path / "r")
    eng_off = CrawlEngine(spark, root, SMALL, n_filter_parts=4, salt=4, use_robots=False)
    eng_off.run(1, seeds=seeds)
    cat = eng_off.catalog
    assert cat.manifest(cat.last_epoch())["meta"]["robots_complete"] is False

    eng_on = CrawlEngine(spark, root, SMALL, n_filter_parts=4, salt=4, use_robots=True)
    eng_on.run(2, seeds=seeds, resume=True)
    cat = eng_on.catalog
    assert cat.manifest(cat.last_epoch())["meta"]["robots_complete"] is True
    pending_hosts = {
        r["host"]
        for r in cat.read_snapshot("frontier")
        .where(F.col("status") == "pending")
        .select("host")
        .distinct()
        .collect()
    }
    rule_hosts = {
        r["host"]
        for r in cat.read_snapshot("robots_rules").select("host").distinct().collect()
    }
    assert pending_hosts <= rule_hosts, "bootstrap must cover robots-off-era hosts"
