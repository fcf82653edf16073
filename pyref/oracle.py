"""pyref — pure-Python single-threaded crawl oracle (SURVEY.md §0.2, §5.2).

The reference checkout at /root/reference is empty (SURVEY.md §0), so this
~250-line simulator is the normative implementation of the spec'd crawl
semantics (BASELINE.json:6): depth/priority-ordered frontier pop under
per-host politeness budgets and robots rules, deterministic synthetic
fetch/parse, exact URL-seen dedup, retry transitions, epoch batching.

It shares every pure function (canonicalize_url, xxh64, synth_doc, budgets,
robots) with the Spark engine, so "identical crawl ordering per host,
identical URL-seen set, per-document span-sequence equality" are checked
against it byte-for-byte by tests/test_crawl_*.py.  If the real reference
ever lands, swap this module out (SURVEY.md §0.2 makes that a one-line
change in tests/conftest.py).

Normative ordering rules (the engine must implement these exactly):
  * per-host per-epoch pop budget: min(max_fetches_per_epoch,
    floor(epoch_window_s / min_delay_s) + 1) — the delay cap is the
    politeness min-delay semantics in logical time (synthgraph.delay_cap)
  * pop key within a host: ascending (priority, depth, url_hash)
  * fetch_seq_in_host: 0-based rank in that order, per (epoch, host)
  * robots gate: every pending URL whose path is disallowed transitions to
    terminal status 'disallowed' at gate time (before ranking; never
    consumes budget)
  * retry: failed fetch -> retries+1; retries >= max_retries -> 'failed',
    else back to 'pending' with priority = depth + 0.5*retries
  * same-epoch duplicate discoveries of one url_hash keep the candidate
    with the smallest (depth, parent_hash)
  * outlinks from a parent at depth == max_depth are not enqueued
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from engine.synthgraph import (
    GraphConfig,
    budget_for_host,
    delay_cap,
    fetch_fails,
    min_delay_for_host,
    robots_allowed,
    robots_rules_for_host,
    synth_doc,
)
from engine.urlnorm import canonicalize_url, host_of, path_of
from engine.xxh64 import xxh64_str


@dataclass
class Rec:
    url: str
    host: str
    depth: int
    priority: float
    status: str  # pending | done | failed | disallowed
    retries: int
    parent_hash: int | None
    discovered_epoch: int


@dataclass
class OracleResult:
    frontier: dict[int, Rec] = field(default_factory=dict)
    # crawl_log rows: (epoch, host, fetch_seq_in_host, url, url_hash)
    crawl_log: list[tuple[int, str, int, str, int]] = field(default_factory=list)
    # docs: canonical url -> (epoch, spans) with spans [(kind,text,media_ref,offset)]
    docs: dict[str, tuple[int, list]] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)

    @property
    def seen_set(self) -> set[int]:
        return set(self.frontier.keys())


def run_crawl(
    seeds: list[str],
    cfg: GraphConfig,
    max_epochs: int = 10,
    use_robots: bool = True,
) -> OracleResult:
    res = OracleResult()
    fr = res.frontier

    for raw in seeds:
        canon = canonicalize_url(raw)
        if canon is None:
            continue
        h = xxh64_str(canon)
        if h not in fr:
            fr[h] = Rec(canon, host_of(canon), 0, 0.0, "pending", 0, None, 0)

    robots_cache: dict[str, list] = {}

    for epoch in range(1, max_epochs + 1):
        pending = [(h, r) for h, r in fr.items() if r.status == "pending"]
        if not pending:
            break

        # --- robots gate (R1 lazy acquisition + R2 longest-prefix match) ---
        n_disallowed = 0
        eligible = []
        for h, r in pending:
            if use_robots:
                if r.host not in robots_cache:
                    robots_cache[r.host] = robots_rules_for_host(r.host, cfg.graph_seed)
                if not robots_allowed(path_of(r.url), robots_cache[r.host]):
                    r.status = "disallowed"
                    n_disallowed += 1
                    continue
            eligible.append((h, r))

        # --- F5 pop: per-host top-k by (priority, depth, url_hash) ---
        by_host: dict[str, list] = defaultdict(list)
        for h, r in eligible:
            by_host[r.host].append((h, r))
        popped = []
        for host, cands in by_host.items():
            # effective budget = logical k ∧ delay cap: with min_delay_s = d
            # only floor(window/d)+1 fetches fit in the epoch window
            # (engine/crawl.py applies the identical cap as a Spark expr)
            k = min(
                budget_for_host(host),
                delay_cap(min_delay_for_host(host, cfg), cfg.epoch_window_s),
            )
            cands.sort(key=lambda t: (t[1].priority, t[1].depth, t[0]))
            for seq, (h, r) in enumerate(cands[:k]):
                res.crawl_log.append((epoch, host, seq, r.url, h))
                popped.append((h, r))

        # --- F6 fetch + X1 parse + X2 extract ---
        n_ok = n_fail = n_links = 0
        candidates: dict[int, tuple[int, int, str]] = {}  # hash -> (depth, parent, url)
        for h, r in popped:
            if fetch_fails(r.url, r.retries, cfg):
                r.retries += 1
                n_fail += 1
                if r.retries >= cfg.max_retries:
                    r.status = "failed"
                else:
                    r.status = "pending"
                    r.priority = r.depth + 0.5 * r.retries
                continue
            r.status = "done"
            n_ok += 1
            spans, outlinks = synth_doc(r.url, cfg)
            res.docs[r.url] = (epoch, spans)
            n_links += len(outlinks)
            cd = r.depth + 1
            if cd > cfg.max_depth:
                continue
            for raw in outlinks:
                canon = canonicalize_url(raw, base=r.url)
                if canon is None:
                    continue
                ch = xxh64_str(canon)
                cur = candidates.get(ch)
                if cur is None or (cd, h) < cur[:2]:
                    candidates[ch] = (cd, h, canon)

        # --- D2 exact dedup + F7 insert ---
        n_new = 0
        for ch, (cd, ph, canon) in candidates.items():
            if ch in fr:
                continue
            fr[ch] = Rec(canon, host_of(canon), cd, float(cd), "pending", 0, ph, epoch)
            n_new += 1

        res.metrics.append(
            {
                "epoch": epoch,
                "urls_popped": len(popped),
                "urls_fetch_ok": n_ok,
                "urls_fetch_fail": n_fail,
                "docs_parsed": n_ok,
                "outlinks_extracted": n_links,
                "outlinks_candidates": len(candidates),
                "outlinks_new": n_new,
                "disallowed": n_disallowed,
                "pending_end": sum(1 for r in fr.values() if r.status == "pending"),
            }
        )
    return res
