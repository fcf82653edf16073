"""Combine raw scaling legs from multiple harness batches into one summary.

The north-rule gate (BASELINE.json `north_rule`) wants throughput scaling
efficiency >= 0.8 from N to 4N.  `tools/bench_scaling.py` runs interleaved
(N, 4N) leg pairs and prints raw legs plus a per-batch summary; when a
measurement session is split across batches (host contention forces
re-runs), this tool pools the RAW legs of all batches for one input shape
and recomputes the summary with the identical per-matched-epoch
best/median protocol (`bench_scaling.best_of`), so the published number
never mixes protocols.

Usage: python tools/combine_scaling.py LABEL N_LO N_HI N_SEEDS file.jsonl [...]
Reads every raw-leg line (those with a "cores" key) whose cores is n_lo or
n_hi, and prints one summary JSON line tagged `run: LABEL`.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_scaling import best_of  # noqa: E402


def main() -> None:
    label, n_lo, n_hi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n_seeds = int(sys.argv[4])
    factor = n_hi / n_lo
    runs_lo, runs_hi = [], []
    for fname in sys.argv[5:]:
        for line in Path(fname).read_text().splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            if "cores" not in rec or "epoch_walls_s" not in rec:
                continue  # per-batch summary line — recomputed here
            if rec["cores"] == n_lo:
                runs_lo.append(rec)
            elif rec["cores"] == n_hi:
                runs_hi.append(rec)
    if not runs_lo or not runs_hi:
        raise SystemExit(f"no legs found for cores {n_lo}/{n_hi}")
    # best_of sizes epochs from runs[0] and zips per-epoch pairs below:
    # pooled legs from different batches MUST be the same epoch sequence
    # (same epoch count, same per-epoch pop counts), else the summary
    # silently misaligns epoch indexes — fail loudly instead.
    ref = runs_lo[0]
    for rec in runs_lo + runs_hi:
        if len(rec["epoch_walls_s"]) != len(ref["epoch_walls_s"]):
            raise SystemExit(
                f"pooled legs disagree on epoch count: "
                f"{len(rec['epoch_walls_s'])} vs {len(ref['epoch_walls_s'])}"
            )
        if rec["urls_popped"] != ref["urls_popped"]:
            raise SystemExit(
                f"pooled legs disagree on per-epoch pops (different input?): "
                f"{rec['urls_popped']} vs {ref['urls_popped']}"
            )
    # batch provenance from the legs' own `run` tags, NOT the file count —
    # one jsonl file can hold several batches (r04 advice: the r4 pooled
    # summary claimed "1 batches" while pooling r4a + r4b from one file)
    batches = sorted({rec.get("run", "untagged") for rec in runs_lo + runs_hi})
    b_lo, b_hi = best_of(runs_lo), best_of(runs_hi)
    eff_best = [
        round((hi["best"] / lo["best"]) / factor, 3)
        for lo, hi in zip(b_lo["per_epoch"], b_hi["per_epoch"])
    ]
    eff_median = [
        round((hi["median"] / lo["median"]) / factor, 3)
        for lo, hi in zip(b_lo["per_epoch"], b_hi["per_epoch"])
    ]
    out = {
        "run": label,
        "protocol": (
            f"pooled raw legs from {len(batches)} interleaved batches "
            f"({', '.join(batches)}), "
            f"taskset-pinned local[{n_lo}] vs local[{n_hi}]; epoch 1 = "
            "JIT/worker warm-up, epochs >= 2 measured; best & median rate "
            "per MATCHED epoch index across all repeats (protocol of "
            "tools/bench_scaling.py, recomputed over the pooled pool)"
        ),
        "n_seed_urls": n_seeds,
        f"local{n_lo}": b_lo,
        f"local{n_hi}": b_hi,
        "per_epoch_efficiency_best": eff_best,
        "per_epoch_efficiency_median": eff_median,
        "scaling_efficiency_best": sorted(eff_best)[len(eff_best) // 2],
        "scaling_efficiency_median": sorted(eff_median)[len(eff_median) // 2],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
