"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates every parity query from the analytics package
(SURVEY.md §2.2 relational surface, crawl-operator parity, and the
training-data pipeline ops); ``oracle_sql()`` carries the matching DuckDB
SQL where the semantics are SQL-expressible (engine-state ops — bloom
probe, pandas-UDF canonicalization internals, LSH candidates — are
registered rows-only and pinned by pytest instead).

``entry(spark)`` is the flagship: the engine's real salted two-stage
window-rank frontier pop (engine/frontier.py F5) over a frontier
synthesized from sf0.001 orders.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from analytics import (  # noqa: E402
    crawl_queries,
    dedup,
    multimodal,
    pipeline,
    relational,
    sampling,
    similarity,
    text,
    udfs,
)

_MODULES = (relational, crawl_queries, dedup, sampling, similarity, text, multimodal, udfs, pipeline)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    if _REPO not in (os.environ.get("PYTHONPATH") or "").split(":"):
        os.environ["PYTHONPATH"] = _REPO + ":" + os.environ.get("PYTHONPATH", "")
    return crawl_queries.frontier_pop(spark, "/root/testdata/sf0.001")


# Run-order: the driver records only the first 50 registered queries per
# round, so each round front-registers the entries with the STALEST driver
# signal.  r03: the two new cluster-resolution queries (first driver run),
# `ann_ivf` (never driver-run) + the 13 queries whose last driver row is
# r01 — i.e. predates the round-2 cell-granular F7 merge and the
# zero-shuffle shingle rewrite (VERDICT.md r02 "What's missing" #1).
_FRONT = (
    # emb_cosine_pairs_blocked gained its DuckDB oracle this round (same SQL
    # as the exact query — the blocked plan is exact by construction), so its
    # first hash-checked driver row must land in r03 (VERDICT r02 task 5).
    "emb_cosine_pairs_blocked",
    # new round-3 pipeline ops (first driver run)
    "doc_pack_sequences",
    "corpus_bigram_topk",
    "doc_decontaminate",
    "doc_repetition_score",
    "doc_mixture_rebalance",
    "emb_quantize_int8",
    "pipeline_pretrain_corpus",
    "dedup_clusters",
    "dedup_keep_list",
    "doc_sample_stratified",
    "doc_split_assign",
    "ann_ivf",
    "frontier_pop",
    "frontier_merge",
    "robots_longest_prefix",
    "canonicalize_urls",
    "seed_ingest",
    "url_keys",
    "synth_fetch_spans",
    "bloom_probe",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "st5_session_window",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    flat: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            assert name not in flat, f"duplicate query name {name}"
            flat[name] = _with_pythonpath(fn)
    out = {name: flat.pop(name) for name in _FRONT if name in flat}
    out.update(flat)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL twins for every SQL-expressible query."""
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out


def _with_pythonpath(fn):
    """Engine queries ship pandas-UDF closures to Python workers, which must
    be able to import engine/ + analytics/ regardless of the driver's env."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        pp = os.environ.get("PYTHONPATH") or ""
        if _REPO not in pp.split(":"):
            os.environ["PYTHONPATH"] = _REPO + ":" + pp if pp else _REPO
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped
