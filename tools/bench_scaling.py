"""Scaling-efficiency evidence for the north rule (BASELINE.json:14).

A real N-vs-4N-executor cluster does not exist in this sandbox, so the
sanctioned protocol is: run the SAME epoch job on the SAME input at two
parallelism levels (local[8] vs local[32]) and report URLs/sec at both
plus efficiency = (throughput_32 / throughput_8) / 4.

Protocol details (recorded in BENCH/BASELINE.md):
- input: deterministic synthetic graph, seeded so epoch 1 pops the entire
  seed frontier (one large batch job — the shape a 10^10-URL crawl has);
- measured: epoch wall for epochs >= 1 (init epoch 0 is one-time setup
  and is reported separately, not part of frontier throughput);
- each parallelism level runs in a FRESH SparkSession with
  shuffle.partitions = 2x cores (the engine's sizing rule, SURVEY.md §4
  O12).

Usage: python tools/bench_scaling.py [n_hosts] [pages_per_host] [epochs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_at(cores: int, n_hosts: int, pages: int, epochs: int) -> dict:
    from engine.crawl import CrawlEngine
    from engine.session import build_session
    from engine.synthgraph import GraphConfig

    cfg = GraphConfig(n_hosts=n_hosts, max_pages=max(pages * 4, 50), max_depth=9)
    spark = build_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    root = tempfile.mkdtemp(prefix=f"scale{cores}_")
    try:
        seeds = [
            f"https://host{h:04d}.example/page/{p}"
            for h in range(n_hosts)
            for p in range(pages)
        ]
        eng = CrawlEngine(
            spark,
            root,
            cfg,
            n_buckets=64,
            n_filter_parts=32,
            salt=16,
            bench_budget=pages * 2,
        )
        t0 = time.time()
        eng.init_run(seeds)
        init_s = time.time() - t0
        walls, popped = [], []
        for ep in range(1, epochs + 1):
            t0 = time.time()
            m = eng.run_epoch(ep)
            walls.append(time.time() - t0)
            popped.append(m["urls_popped"])
        total_popped, total_wall = sum(popped), sum(walls)
        return {
            "cores": cores,
            "init_s": round(init_s, 1),
            "epoch_walls_s": [round(w, 1) for w in walls],
            "urls_popped": popped,
            "urls_per_sec": round(total_popped / total_wall, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def best_of(runs: list[dict]) -> dict:
    """Per-epoch MIN wall across repeats — the host shows multi-minute
    contention episodes (identical runs swing 22s..177s per epoch), so the
    minimum is the uncontended measurement; medians are reported too."""
    epochs = len(runs[0]["epoch_walls_s"])
    min_walls = [min(r["epoch_walls_s"][i] for r in runs) for i in range(epochs)]
    med_walls = [
        sorted(r["epoch_walls_s"][i] for r in runs)[len(runs) // 2]
        for i in range(epochs)
    ]
    popped = sum(runs[0]["urls_popped"])
    return {
        "cores": runs[0]["cores"],
        "repeats": len(runs),
        "urls_popped_per_run": popped,
        "epoch_walls_min_s": min_walls,
        "epoch_walls_median_s": med_walls,
        "urls_per_sec_best": round(popped / sum(min_walls), 1),
        "urls_per_sec_median": round(popped / sum(med_walls), 1),
    }


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    runs8, runs32 = [], []
    for rep in range(repeats):  # interleave legs to decorrelate host drift
        r8 = run_at(8, n_hosts, pages, epochs)
        print(json.dumps(r8), flush=True)
        runs8.append(r8)
        r32 = run_at(32, n_hosts, pages, epochs)
        print(json.dumps(r32), flush=True)
        runs32.append(r32)

    b8, b32 = best_of(runs8), best_of(runs32)
    out = {
        "protocol": (
            "same job, same input, local[8] vs local[32], interleaved x"
            f"{repeats}, per-epoch min wall (host contention episodes make "
            "single runs swing 2-5x; see raw runs above)"
        ),
        "n_seed_urls": n_hosts * pages,
        "epochs": epochs,
        "local8": b8,
        "local32": b32,
        "scaling_efficiency_best": round(
            (b32["urls_per_sec_best"] / b8["urls_per_sec_best"]) / 4, 3
        ),
        "scaling_efficiency_median": round(
            (b32["urls_per_sec_median"] / b8["urls_per_sec_median"]) / 4, 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
