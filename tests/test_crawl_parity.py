"""Golden crawl-semantics tests: Spark engine vs pyref oracle (SURVEY.md §5.2).

The three BASELINE.json:6 invariants under the same seed list + politeness
budget: identical crawl ordering per host, identical URL-seen set, and
per-document span-sequence equality (kind, text, media_ref, order).
"""

from __future__ import annotations

import pytest

from tests.conftest import run_engine


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory, tiny_cfg, tiny_seeds):
    root = tmp_path_factory.mktemp("crawl_tiny")
    eng, metrics = run_engine(spark, root, tiny_cfg, tiny_seeds, max_epochs=4)
    return eng, metrics


def test_crawl_order_per_host(engine_run, tiny_oracle):
    eng, _ = engine_run
    got = sorted(
        (r["epoch"], r["host"], r["fetch_seq_in_host"], r["url"], r["url_hash"])
        for r in eng.catalog.read_appended("crawl_log").collect()
    )
    want = sorted(tiny_oracle.crawl_log)
    assert len(got) == len(want)
    assert got == want


def test_url_seen_set(engine_run, tiny_oracle):
    eng, _ = engine_run
    got = {r["url_hash"] for r in eng.catalog.read_snapshot("frontier").select("url_hash").collect()}
    assert got == tiny_oracle.seen_set


def test_frontier_statuses(engine_run, tiny_oracle):
    eng, _ = engine_run
    got = {
        r["url_hash"]: (r["status"], r["depth"], r["retries"])
        for r in eng.catalog.read_snapshot("frontier").collect()
    }
    want = {h: (rec.status, rec.depth, rec.retries) for h, rec in tiny_oracle.frontier.items()}
    assert got == want


def test_span_sequence_equality(engine_run, tiny_oracle):
    eng, _ = engine_run
    rows = eng.catalog.read_appended("documents").collect()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }
    want = {url: [tuple(s) for s in spans] for url, (ep, spans) in tiny_oracle.docs.items()}
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], f"span mismatch for {doc_id}"


def test_metrics_parity(engine_run, tiny_oracle):
    eng, _ = engine_run
    rows = eng.catalog.read_appended("metrics").collect()
    got: dict[int, dict] = {}
    for r in rows:
        got.setdefault(r["epoch"], {})[r["key"]] = r["value"]
    keys = [
        "urls_popped",
        "urls_fetch_ok",
        "urls_fetch_fail",
        "docs_parsed",
        "outlinks_extracted",
        "outlinks_candidates",
        "outlinks_new",
        "disallowed",
        "pending_end",
    ]
    for m in tiny_oracle.metrics:
        ep = m["epoch"]
        for k in keys:
            assert got[ep][k] == pytest.approx(m[k]), f"epoch {ep} metric {k}"
