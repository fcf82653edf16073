"""Best-of-N wall timing for individual registered queries — the local
feedback loop for plan work (bench.py times the whole headline suite; this
times just the queries named on the command line, on a warm session).

Usage: python tools/time_queries.py [sf_dir] [repeats] query [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:]

    import __spark_entry__ as entry
    from engine.session import build_session

    spark = build_session(app_name="time-queries")
    qs = entry.queries()
    # one throwaway action to absorb session/codegen warm-up
    spark.range(10).count()
    for name in names:
        walls = []
        for _ in range(repeats):
            # queries that persist() intermediates would otherwise serve
            # repeats 2..N from cache (plan-equality cache hits)
            spark.catalog.clearCache()
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 2))
        print(f"{name}: rows={n} best={min(walls)}s walls={walls}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
