"""Hardware scaling ceiling probe (no Spark).

Runs the pipeline's per-document Python kernel (fused langid+perplexity
scoring, scrub, heuristics — the exact code the pandas UDF executes) in K
INDEPENDENT single-core-pinned processes and reports aggregate docs/sec.
Zero coordination, zero I/O, zero shuffle: this is the embarrassingly-
parallel upper bound of what this box can scale, so

    hardware_ceiling(8→32) = agg_docs_per_sec@32 / (4 × agg_docs_per_sec@8)

is the maximum efficiency ANY job of this workload class (memory-bound
string/numpy batch work) can show between local[8] and local[32] here.
On a real cluster N→4N executors multiplies memory bandwidth and disks by
4× (separate machines), so the ceiling is ~1.0 there; this probe exists to
separate the sandbox's shared-memory-bus artifact from the plan's own
scaling behavior.

Usage: python tools/hw_ceiling.py [seconds_per_leg]
Prints one JSON line: {"agg_8": .., "agg_32": .., "ceiling": ..}
"""

from __future__ import annotations

import json
import subprocess
import sys

_KERNEL = """
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ["MALLOC_MMAP_THRESHOLD_"] = str(1 << 30)
os.environ["MALLOC_TRIM_THRESHOLD_"] = str(1 << 30)
import numpy as np
import pyarrow.parquet as pq
t = pq.read_table(sys.argv[1], columns=["text"]).slice(0, 10000)
texts = t.column("text").to_pylist()
from packs_spark.ml.ngram import LangIdModel, PerplexityModel, fused_predict
from packs_spark.pipeline.scrub import scrub_batch
from packs_spark.pipeline.udfs import _heuristic_batch
from packs_spark.pipeline.rules import STOPWORDS
lid = LangIdModel.train(); pplm = PerplexityModel.train()
stacked = np.concatenate([lid.tables, pplm.table[None, :]], 0)
stop = frozenset(STOPWORDS)
fused_predict(texts, stacked, len(lid.langs)); scrub_batch(texts)
_heuristic_batch(texts, stop)  # warm arenas
budget = float(sys.argv[2])
t0 = time.time(); n = 0
while time.time() - t0 < budget:
    fused_predict(texts, stacked, len(lid.langs))
    scrub_batch(texts)
    _heuristic_batch(texts, stop)
    n += 10000
print(n / (time.time() - t0))
"""


def measure(src: str, seconds: float = 8.0) -> dict:
    agg = {}
    for k in (8, 32):
        procs = [
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", _KERNEL,
                 src, str(seconds)],
                stdout=subprocess.PIPE, text=True,
            )
            for i in range(k)
        ]
        agg[k] = sum(
            float(p.communicate()[0].strip().splitlines()[-1]) for p in procs
        )
    return {
        "agg_8": round(agg[8], 1),
        "agg_32": round(agg[32], 1),
        "ceiling": round(agg[32] / (4 * agg[8]), 3),
    }


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    import os

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "data", "webpages_1000000.parquet",
    )
    print(json.dumps(measure(src, secs)))
