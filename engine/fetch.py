"""F6 fetch + X1 parse + X2 extract — one fused Arrow crossing (UD2).

SURVEY.md §3.1 notes stages 4-5 form a narrow chain with no shuffle between
them; fusing fetch/parse/extract into a single ``mapInPandas`` removes a
JVM↔Python Arrow round-trip per epoch (the hot path of the URLs/sec
north-star).  The content source is the deterministic synthetic graph
(engine/synthgraph.py, shared with the pyref oracle — FIXTURES.md §2); in
production this function body is the HTTP client + HTML tokenizer, with the
same batch signature.

Politeness delay bookkeeping (min_delay_s): the pop order within a host IS
the fetch order (F5's fetch_seq_in_host), so each row's logical fetch time
is ``fetch_at_s = fetch_seq_in_host * min_delay_s`` — computed vectorized
inside the batch and guaranteed <= cfg.epoch_window_s because the F5 pop
caps k at floor(window/delay)+1 (engine/crawl.py delay_cap_expr; parity
with pyref under nonzero delays pinned by tests/test_politeness_delay.py).
In production the batch loop additionally sleeps to the fetch_at_s
schedule per host — rows arrive host-clustered after F5's shuffle, so the
serialization is local to a task (SURVEY.md §2.1 F6); with the synthetic
zero-latency fetcher the schedule is bookkeeping only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from engine.schemas import FETCHED
from engine.synthgraph import GraphConfig, fetch_fails, synth_doc


def fetch_parse(popped: DataFrame, cfg: GraphConfig) -> DataFrame:
    """(url_hash, url, host, depth, retries[, fetch_seq_in_host,
    min_delay_s]) → FETCHED schema rows.  The two optional columns drive
    the fetch_at_s delay schedule; absent (e.g. the synth_fetch_spans
    parity query feeds a raw frontier), the schedule is all-zero."""
    has_delay = {"fetch_seq_in_host", "min_delay_s"} <= set(popped.columns)

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
            if has_delay:
                fetch_at = (
                    pdf["fetch_seq_in_host"].astype("float64") * pdf["min_delay_s"]
                )
            else:
                fetch_at = 0.0
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
                    "fetch_at_s": fetch_at,
                }
            )

    cols = ["url_hash", "url", "host", "depth", "retries"]
    if has_delay:
        cols += ["fetch_seq_in_host", "min_delay_s"]
    return popped.select(*cols).mapInPandas(run, FETCHED)
