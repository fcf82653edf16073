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
    relational,
    similarity,
    text,
    udfs,
)

_MODULES = (relational, crawl_queries, dedup, similarity, text, multimodal, udfs)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    if _REPO not in (os.environ.get("PYTHONPATH") or "").split(":"):
        os.environ["PYTHONPATH"] = _REPO + ":" + os.environ.get("PYTHONPATH", "")
    return crawl_queries.frontier_pop(spark, "/root/testdata/sf0.001")


# Run-order: r01's driver recorded only the first 50 registered queries, so
# the 13 entries it never reached (or failed) are registered FIRST this round
# — every query then has a hard driver signal in r01 ∪ r02.
_FRONT = (
    "x_math_funcs",
    "x_map_funcs",
    "x_struct_funcs",
    "ud5_grouped_agg_udaf",
    "emb_cosine_pairs",
    "emb_cosine_pairs_blocked",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
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
