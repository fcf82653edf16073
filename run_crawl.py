"""CLI entry point (SURVEY.md §3.1): run/resume a crawl over the synthetic graph.

Production invocation (BASELINE.json:14):
    spark-submit --py-files engine.zip run_crawl.py --root /data/crawl \\
        --graph bench --epochs 8 [--resume] [--master spark://...]

Sandbox invocation is identical minus the cluster master (local[N]).
"""

from __future__ import annotations

import argparse
import json

from engine.crawl import CrawlEngine
from engine.session import build_session
from engine.synthgraph import BENCH, SKEW, TINY, TINY_FLAKY, GraphConfig, gen_seed_urls

GRAPHS = {"tiny": TINY, "tiny_flaky": TINY_FLAKY, "skew": SKEW, "bench": BENCH}


def main() -> None:
    ap = argparse.ArgumentParser(description="distributed-spider-spark crawler")
    ap.add_argument("--root", required=True, help="catalog root directory")
    ap.add_argument("--graph", default="tiny", choices=sorted(GRAPHS))
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None, help="spark master (default: local[ncpu])")
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--filter-parts", type=int, default=16)
    ap.add_argument("--skew-host0", type=int, default=0, help="extra host0000 seeds")
    ap.add_argument(
        "--filter-kind", default="bloom", choices=("bloom", "cuckoo"),
        help="URL-seen sidecar kind (engine/seen.py vs engine/cuckoo.py)",
    )
    ap.add_argument(
        "--bench-budget", type=int, default=None,
        help="uniform politeness budget override (throughput benches only)",
    )
    args = ap.parse_args()

    cfg: GraphConfig = GRAPHS[args.graph]
    seeds = gen_seed_urls(cfg, skew_host0=args.skew_host0)
    spark = build_session(master=args.master)
    eng = CrawlEngine(
        spark,
        args.root,
        cfg,
        n_buckets=args.n_buckets,
        n_filter_parts=args.filter_parts,
        salt=args.salt,
        filter_kind=args.filter_kind,
        bench_budget=args.bench_budget,
    )
    metrics = eng.run(args.epochs, seeds=seeds, resume=args.resume)
    for m in metrics:
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v for k, v in m.items()}))
    last = eng.catalog.last_epoch()
    print(json.dumps({"committed_epoch": last, "root": args.root}))
    spark.stop()


if __name__ == "__main__":
    main()
