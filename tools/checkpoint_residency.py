"""Measure localCheckpoint block residency across a query sequence.

VERDICT r12 #3a/#4: checkpointed blocks are NOT freed by
spark.catalog.clearCache(); over a multi-query suite reclamation used
to rely on Python GC + ContextCleaner lag. This tool runs the
checkpoint-heavy queries back-to-back and logs, after each sample,
(a) the persistent-RDD count and storage memory LEFT BEHIND by the
query, and (b) both again after the bench's cleanup step
(gc.collect + explicit unpersist of every persistent RDD) — proving
residency stays flat with the cleanup and accumulates without it.

Usage: python tools/checkpoint_residency.py [--no-cleanup]
"""

from __future__ import annotations

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402

QUERIES = [
    "minhash_lsh_pairs", "simhash_pairs", "corpus_curation",
    "corpus_curation_v2", "corpus_curation_v2_sampled", "corpus_curation_v3",
    "ngram_lm_score", "perplexity_buckets_sampled", "dsir_resample",
    "decontaminate_sharded", "conformal_interval", "stacking_forecast",
]


def _storage(spark):
    jsc = spark.sparkContext._jsc
    n = jsc.getPersistentRDDs().size()
    mem = 0
    disk = 0
    for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    return n, mem, disk


def main() -> None:
    cleanup = "--no-cleanup" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("checkpoint-residency")
    qs = queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    print(f"cleanup={'ON' if cleanup else 'OFF'} sf_dir={sf_dir}")
    print(f"{'query':34s} {'rdds':>5s} {'mem_MB':>8s} {'disk_MB':>8s}"
          f" {'rdds*':>5s} {'mem_MB*':>8s}   (* = after cleanup step)")
    for name in QUERIES:
        if name not in qs:
            continue
        for s in range(2):
            qs[name](spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            spark.catalog.clearCache()
            n0, m0, d0 = _storage(spark)
            if cleanup:
                gc.collect()
                for jrdd in list(
                        spark.sparkContext._jsc.getPersistentRDDs().values()):
                    jrdd.unpersist(False)
            n1, m1, _ = _storage(spark)
            print(f"{name}[{s}]{'':{max(0, 31 - len(name))}s} {n0:5d}"
                  f" {m0 / 2**20:8.1f} {d0 / 2**20:8.1f} {n1:5d}"
                  f" {m1 / 2**20:8.1f}", flush=True)


if __name__ == "__main__":
    main()
