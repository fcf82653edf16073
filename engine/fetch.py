"""F6 fetch + X1 parse + X2 extract — one fused Arrow crossing (UD2).

SURVEY.md §3.1 notes stages 4-5 form a narrow chain with no shuffle between
them; fusing fetch/parse/extract into a single ``mapInPandas`` removes a
JVM↔Python Arrow round-trip per epoch (the hot path of the URLs/sec
north-star).  The content source is the deterministic synthetic graph
(engine/synthgraph.py, shared with the pyref oracle — FIXTURES.md §2); in
production this function body is the HTTP client + HTML tokenizer, with the
same batch signature.

Politeness delay bookkeeping (min_delay_s) would live inside the batch
loop: after F5's window shuffle the popped rows arrive host-clustered, so
per-host serialization is local to a task (SURVEY.md §2.1 F6).  The sandbox
budgets set min_delay_s=0.0 (FIXTURES.md §4) — the logical budget k is the
politeness contract under test.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from engine.schemas import FETCHED
from engine.synthgraph import GraphConfig, fetch_fails, synth_doc


def fetch_parse(popped: DataFrame, cfg: GraphConfig) -> DataFrame:
    """(url_hash, url, host, depth, retries) → FETCHED schema rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, spans_col, links_col = [], [], []
            for url, retries in zip(pdf["url"], pdf["retries"]):
                if fetch_fails(url, int(retries), cfg):
                    oks.append(False)
                    spans_col.append(None)
                    links_col.append(None)
                    continue
                spans, outlinks = synth_doc(url, cfg)
                oks.append(True)
                spans_col.append(
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in spans
                    ]
                )
                links_col.append(outlinks)
            yield pd.DataFrame(
                {
                    "url_hash": pdf["url_hash"],
                    "url": pdf["url"],
                    "host": pdf["host"],
                    "depth": pdf["depth"],
                    "retries": pdf["retries"],
                    "ok": oks,
                    "spans": spans_col,
                    "outlinks": links_col,
                }
            )

    cols = ["url_hash", "url", "host", "depth", "retries"]
    return popped.select(*cols).mapInPandas(run, FETCHED)
