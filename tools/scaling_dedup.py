"""Supplementary scaling evidence for the DEDUP path (MinHash-LSH).

Same protocol as bench.py --scaling (taskset-pinned cores, fresh JVM per
level, min-of-N with the first iteration discarded as warm-up), applied to
the full near-dup chain: shingle → MinHash signatures (per-row fold) →
banded-LSH candidate join → distinct.

Corpus shape matters: replicating a small table R× puts EVERY doc in an
R-clique and the quadratic intra-clique join dominates — unrepresentative
(real dup rates are a few percent) and shuffle-bound on this shared host.
Instead the corpus is synthesized with md5-derived UNIQUE token streams
(deterministic at any parallelism, no shared shingles beyond chance) plus a
5% planted exact-dup rate — the mix a production dedup pass actually sees,
where the embarrassingly-parallel signature stage carries most of the work
and pair volume ∝ dups.

Usage: python tools/scaling_dedup.py [n_docs]   (default 1_000_000)
Prints one JSON line per level plus the N→4N efficiency.
"""

from __future__ import annotations

import json
import subprocess
import sys

LEVELS = ((4, "0-3"), (16, "0-15"))

_WORKER = """
import sys, time
from pyspark.sql import functions as F
from schema_infer_plugin_spark.session import get_spark
from schema_infer_plugin_spark.datapipe import lsh_candidate_pairs, minhash_signatures
cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 8),
    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
text = F.array_join(
    F.transform(F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.substring(F.md5(F.concat_ws(":", F.col("id").cast("string"),
                                                        i.cast("string"))), 1, 6)),
    " ")
base = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
dups = base.filter(F.col("doc_id") % 20 == 0).select(
    (F.col("doc_id") + 10**9).alias("doc_id"), "text")
corpus = base.unionByName(dups).repartition(cpus * 4).persist()
n = corpus.count()
secs = []
for _ in range(4):
    t0 = time.time()
    sig = minhash_signatures(corpus, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, "doc_id", bands=4, min_est_jaccard=0.5)
    n_pairs = pairs.count()
    secs.append(round(time.time() - t0, 3))
best = min(secs[1:])
print(__import__('json').dumps({"cpus": cpus, "docs": n, "pairs": n_pairs,
                  "iters_sec": secs, "best_sec": best,
                  "docs_per_sec": int(n / best)}))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    results = {}
    for cpus, cores in LEVELS:
        out = subprocess.run(
            ["taskset", "-c", cores, sys.executable, "-c", _WORKER, str(cpus), str(n_docs)],
            capture_output=True, text=True, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    lo, hi = (LEVELS[0][0], LEVELS[1][0])
    eff = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"] / (hi / lo)
    print(json.dumps({"metric": "dedup_scaling_efficiency_n_to_4n",
                      "pair": f"local[{lo}]->local[{hi}]",
                      "value": round(eff, 3)}))


if __name__ == "__main__":
    main()
