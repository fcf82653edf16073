"""Host scaling diagnostics backing BENCH/BASELINE.md's protocol choices.

Three probes, each taskset-pinned:

1. raw multiprocessing CPU scaling (no JVM) — establishes what the host's
   "32 CPUs" can actually deliver;
2. Spark JVM compute (xxhash chain over range, no shuffle/Python), cold
   then warm — quantifies the whole-stage-codegen JIT warm-up cost, which
   is constant (driver-side compile) and therefore anti-scales;
3. Spark mapInPandas Python compute — the crawl fetch/parse shape.

Usage: python tools/diag_host_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _burn(q):
    t0 = time.time()
    x = n = 0
    while time.time() - t0 < 5:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        n += 100000
    q.put(n)


def raw_cpu(nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return round(total / 5 / 1e6, 1)  # M ops/s aggregate


_SPARK_PROBE = r"""
import sys, time, json
sys.path.insert(0, sys.argv[1])
cores = int(sys.argv[2])
from engine.session import build_session
from pyspark.sql import functions as F
import pandas as pd
spark = build_session(master=f"local[{cores}]", shuffle_partitions=2 * cores)
expr = F.sum(F.pmod(F.xxhash64(F.xxhash64(F.xxhash64("id"))), F.lit(1000000007)))
out = {"cores": cores}
for rep in range(3):
    t = time.time()
    spark.range(0, 400_000_000, 1, cores * 4).select(expr).collect()
    out[f"jvm_rep{rep}_s"] = round(time.time() - t, 2)
from engine.synthgraph import synth_doc, TINY
def gen(batches):
    for pdf in batches:
        n = 0
        for u in pdf["url"]:
            spans, links = synth_doc(u, TINY)
            n += len(spans)
        yield pd.DataFrame({"n": [n]})
urls = spark.range(0, 400_000, 1, cores * 4).select(
    F.concat(F.lit("https://h"), (F.col("id") % 997).cast("string"),
             F.lit(".example/p/"), F.col("id").cast("string")).alias("url"))
for rep in range(2):
    t = time.time()
    urls.mapInPandas(gen, "n long").agg(F.sum("n")).collect()
    out[f"py_rep{rep}_s"] = round(time.time() - t, 2)
print(json.dumps(out))
spark.stop()
"""


def spark_probe(cores: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
        _SPARK_PROBE, str(REPO), str(cores),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    print(json.dumps({"raw_cpu_Mops": {n: raw_cpu(n) for n in (1, 8, 32)}}))
    for cores in (8, 32):
        print(json.dumps(spark_probe(cores)), flush=True)


if __name__ == "__main__":
    main()
