"""Wall-clock scaling rows for dedup_clusters(auto) (VERDICT r11 #6):
the planted diameter-64 chain test pins ROUND counts, but the auto
engine (budgeted label propagation escalating to star contraction)
had no measured wall-clock rows alongside the other curation ops in
COVERAGE.md's scaling table. This probe measures the engine itself —
pairs are SUPPLIED, so minhash cost is excluded — on two corpus
shapes per size:

- ``planted``: n docs in n/5 clusters of 5 (consecutive-id chains of
  diameter 4) — the shallow shape real near-dup corpora have; the
  label-prop fast path must converge inside its budget, no
  escalation.
- ``chain``: ONE chain of length n (diameter n-1) — the adversarial
  shape; label_prop burns its budget and the star escalation must
  finish in O(log^2) rounds, diameter-independently.

Everything is generated DISTRIBUTED (spark.range expressions — no
driver-side pandas), and each run asserts the planted component
count, so a mislabeling cannot masquerade as a fast run.

Off-registry by design. Usage: python tools/cc_scaling.py [n ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from polars_ts_spark.operators import textops  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402


def _docs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("text"))


def run(spark, n: int, shape: str) -> dict:
    docs = _docs(spark, n)
    if shape == "planted":
        edges = (
            spark.range(n - 1)
            .where((F.col("id") + 1) % 5 != 0)  # stay inside the 5-cluster
            .select(F.col("id").alias("doc_id_1"),
                    (F.col("id") + 1).alias("doc_id_2"))
        )
        want_clusters = (n + 4) // 5
    elif shape == "chain":
        edges = spark.range(n - 1).select(
            F.col("id").alias("doc_id_1"), (F.col("id") + 1).alias("doc_id_2"))
        want_clusters = 1
    else:
        raise ValueError(shape)
    rounds: list[int] = []
    t0 = time.monotonic()
    out = textops.dedup_clusters(
        docs, pairs=edges, algorithm="auto", rounds_out=rounds)
    got = out.agg(
        F.countDistinct("cluster_id").alias("k"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    dt = time.monotonic() - t0
    assert got["n"] == n, (got["n"], n)
    assert got["k"] == want_clusters, (got["k"], want_clusters)
    return {"shape": shape, "n_docs": n, "wall_s": round(dt, 2),
            "rounds": rounds[0], "n_clusters": got["k"]}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 500_000]
    spark = get_spark("cc-scaling")
    out = []
    for n in sizes:
        for shape in ("planted", "chain"):
            r = run(spark, n, shape)
            print(json.dumps(r), flush=True)
            out.append(r)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
