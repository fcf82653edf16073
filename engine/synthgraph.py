"""Deterministic synthetic web graph — the F6 fetcher's world (FIXTURES.md §1-§5).

Single source of truth for both the Spark engine's fetcher (engine/fetch.py,
inside mapInPandas) and the pyref oracle (SURVEY.md §7 hard-part 4): the same
pure functions, seeded by xxh64 of the URL, so fetched bytes are identical by
construction (no network in sandbox, SURVEY.md §0.3).

No pyspark imports allowed in this module.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from engine.xxh64 import xxh64_u

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()


@dataclass(frozen=True)
class GraphConfig:
    """Parameters of the closed synthetic graph (FIXTURES.md §2)."""

    n_hosts: int = 20
    max_pages: int = 50
    max_depth: int = 4
    graph_seed: int = 42
    fail_mod: int = 0  # 0 = fetches never fail; 20 = 5% deterministic failures
    max_retries: int = 2
    # politeness delay semantics (logical time — deterministic, no wall clock):
    # an epoch is a window of epoch_window_s logical seconds; a host with
    # min_delay_s = d > 0 fetches at t = 0, d, 2d, ..., so at most
    # floor(window/d) + 1 fetches fit — the effective per-epoch budget is
    # min(max_fetches_per_epoch, that cap).  delay_mod > 0 assigns hosts
    # deterministic delays in [0, delay_mod) seconds (0 = all delays 0.0).
    epoch_window_s: float = 10.0
    delay_mod: int = 0


TINY = GraphConfig(n_hosts=20, max_pages=50, max_depth=4)
TINY_FLAKY = GraphConfig(n_hosts=20, max_pages=50, max_depth=4, fail_mod=12)
SKEW = GraphConfig(n_hosts=10, max_pages=400, max_depth=3)
BENCH = GraphConfig(n_hosts=2000, max_pages=200, max_depth=6)


def _host(h: int) -> str:
    return f"host{h:04d}.example"


def _messify(url: str, pick: int) -> str:
    """Deterministic messy variant of a clean URL (exercises C1)."""
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    path = "/" + path
    m = pick % 5
    if m == 0:
        return scheme + "://" + host.upper() + path
    if m == 1:
        port = ":443" if scheme == "https" else ":80"
        return scheme + "://" + host + port + path
    if m == 2:
        return url + "#section-2"
    if m == 3:
        return url + "?utm_source=x&utm_medium=y"
    # dot-segment noise: /page/3 -> /a/../page/3
    return scheme + "://" + host + "/a/.." + path


def gen_seed_urls(cfg: GraphConfig, skew_host0: int = 0) -> list[str]:
    """Seed list (FIXTURES.md §1): /page/0 per host + 10% messy variants.

    ``skew_host0`` > 0 additionally seeds host0000 with that many pages
    (the §5.6 skew fixture: one host holding ~50% of the frontier).
    """
    seeds = []
    for h in range(cfg.n_hosts):
        url = f"https://{_host(h)}/page/0"
        if xxh64_u(f"seedmess:{h}:{cfg.graph_seed}") % 10 == 0:
            url = _messify(url, xxh64_u(f"seedpick:{h}:{cfg.graph_seed}"))
        seeds.append(url)
    for p in range(1, skew_host0 + 1):
        seeds.append(f"https://{_host(0)}/page/{p % cfg.max_pages}")
    return seeds


def synth_doc(
    canonical_url: str, cfg: GraphConfig
) -> tuple[list[tuple[str, str | None, str | None, int]], list[str]]:
    """Deterministic fetch+content of a URL (FIXTURES.md §2).

    Returns ``(spans, outlinks)`` where spans is an ordered list of
    ``(kind, text, media_ref, offset)`` tuples — kind ∈ {'text','media'},
    offsets strictly increasing — and outlinks is a list of raw (possibly
    messy) absolute URLs: ~70% same-host, ~25% cross-host, ~5% messy, and
    ~5% of targets under /private/ (robots-disallow bait, FIXTURES.md §5).
    """
    rng = random.Random(xxh64_u(canonical_url, seed=42) ^ cfg.graph_seed)
    host = canonical_url.split("://", 1)[1].split("/", 1)[0].partition(":")[0]

    n_spans = rng.randint(3, 12)
    start_text = rng.random() < 0.7
    spans: list[tuple[str, str | None, str | None, int]] = []
    offset = 0
    for i in range(n_spans):
        is_text = start_text if i % 2 == 0 else not start_text
        if is_text:
            words = rng.choices(_WORDS, k=rng.randint(4, 20))
            text = " ".join(words)
            spans.append(("text", text, None, offset))
            offset += len(text) + 1
        else:
            ref = f"media://{rng.getrandbits(48):012x}"
            spans.append(("media", None, ref, offset))
            offset += 1

    n_links = rng.randint(0, 8)
    outlinks: list[str] = []
    for _ in range(n_links):
        r = rng.random()
        if r < 0.70:
            target_host = host
        else:
            target_host = _host(rng.randrange(cfg.n_hosts))
        page = rng.randrange(cfg.max_pages)
        seg = "private" if rng.random() < 0.05 else "page"
        link = f"https://{target_host}/{seg}/{page}"
        if rng.random() < 0.05:
            link = _messify(link, rng.getrandbits(16))
        outlinks.append(link)
    return spans, outlinks


def fetch_fails(canonical_url: str, attempt: int, cfg: GraphConfig) -> bool:
    """Deterministic fetch-failure oracle (drives Q1 retry semantics)."""
    if cfg.fail_mod <= 0:
        return False
    return xxh64_u(f"fail:{canonical_url}:{attempt}:{cfg.graph_seed}") % cfg.fail_mod == 0


def budget_for_host(host: str) -> int:
    """max_fetches_per_epoch = 1 + (xxhash64(host) % 5)  (FIXTURES.md §4)."""
    return 1 + xxh64_u(host) % 5


def min_delay_for_host(host: str, cfg: GraphConfig) -> float:
    """Deterministic per-host min_delay_s in [0, delay_mod) whole seconds
    (0.0 for every host when cfg.delay_mod <= 0 — the default fixtures)."""
    if cfg.delay_mod <= 0:
        return 0.0
    return float(xxh64_u(f"delay:{host}:{cfg.graph_seed}") % cfg.delay_mod)


def delay_cap(min_delay_s: float, window_s: float) -> int:
    """Max fetches that fit in one epoch window at the given delay: fetches
    at t = 0, d, 2d, ... <= window  =>  floor(window/d) + 1.  Shared by the
    engine (as the equivalent Spark expression in engine/crawl.py) and the
    pyref oracle so both cap the per-epoch pop identically."""
    if min_delay_s <= 0:
        return (1 << 31) - 1
    return int(window_s // min_delay_s) + 1


def gen_budgets(cfg: GraphConfig) -> list[tuple[str, int, float]]:
    """politeness_budgets rows (host, max_fetches_per_epoch, min_delay_s)."""
    return [
        (_host(h), budget_for_host(_host(h)), min_delay_for_host(_host(h), cfg))
        for h in range(cfg.n_hosts)
    ]


def robots_rules_for_host(host: str, graph_seed: int = 42) -> list[tuple[int, bool, str, float]]:
    """Synthetic robots.txt rules (FIXTURES.md §5); [] for rule-less hosts.

    Rows are (rule_order, allow, path_prefix, crawl_delay).  50% of hosts
    have rules; ruled hosts always disallow /private/ and 25% of them also
    disallow /page/ (longest-prefix-match, tie → allow: SURVEY.md §1.2).
    """
    if xxh64_u(f"robots:{host}:{graph_seed}") % 2 != 0:
        return []
    rules = [(0, True, "/", 0.0), (1, False, "/private/", 0.0)]
    if xxh64_u(f"robots2:{host}:{graph_seed}") % 4 == 0:
        rules.append((2, False, "/page/", 0.0))
    return rules


def robots_allowed(path: str, rules: list[tuple[int, bool, str, float]]) -> bool:
    """Longest-prefix-match wins; tie → allow; no matching rule → allow."""
    best_len = -1
    best_allow = True
    for _order, allow, prefix, _delay in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow
