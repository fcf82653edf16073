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
    graph,
    multimodal,
    pipeline,
    relational,
    sampling,
    similarity,
    text,
    udfs,
)

_MODULES = (relational, crawl_queries, dedup, sampling, similarity, text, multimodal, udfs, pipeline, graph)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    if _REPO not in (os.environ.get("PYTHONPATH") or "").split(":"):
        os.environ["PYTHONPATH"] = _REPO + ":" + os.environ.get("PYTHONPATH", "")
    return crawl_queries.frontier_pop(spark, "/root/testdata/sf0.001")


# Run-order: the driver records only the first 50 registered queries per
# round, so each round front-registers the entries with the STALEST driver
# signal.  r04 (VERDICT r03 task 3): the two r03 red rows whose fixes land
# this round, the three queries whose plans changed in r03 via
# `load_spread` AFTER their last driver row, then the 22 remaining queries
# whose last driver row is r02 — every registered query then has a driver
# row from r03 or r04.
_FRONT = (
    # new round-4 ops (first driver run)
    "kmeans_train",
    "corpus_token_stats",
    "url_template_topk",
    "recrawl_priority",
    "w5_range_frame",
    "a7_cube",
    "st7_stream_static_join",
    "doc_gopher_filter",
    "dup_ngram_spans",
    "media_interleave_stats",
    "media_phash_dedup",
    "dedup_semantic",
    "link_pagerank",
    "doc_pii_scrub",
    "doc_quality_buckets",
    "doc_chunk_overlap",
    "doc_tfidf_topk",
    "doc_lm_score",
    # r03 red rows, fixed this round (oracle HUGEINT cast; array→string shape)
    "doc_pack_sequences",
    "emb_quantize_int8",
    # plans changed in r03 (load_spread) after their last (r02) driver row
    "emb_cosine_pairs",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    # plans changed in r04 (struct-packed minhash signatures + in-Arrow
    # band hashes; shared shingle builder; blocked-GEMM spread) after
    # their last driver row
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "emb_cosine_pairs_blocked",
    # last driver row r02
    "t2_topk_limit",
    "t3_group_topk",
    "u1_union",
    "u2_intersect_except",
    "u3_distinct_pairs",
    "x_string_funcs",
    "x_hash_funcs",
    "x_date_funcs",
    "x_math_funcs",
    "x_array_funcs",
    "x_json_funcs",
    "x_map_funcs",
    "x_struct_funcs",
    "st3_tumbling_window",
    "st4_sliding_window",
    "ud5_grouped_agg_udaf",
    "text_quality",
    "text_langid",
    "token_count",
    "doc_fingerprint",
    "media_decode_stub",
    "media_frame_sample",
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
