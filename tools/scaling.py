"""Data-scaling probe: run representative queries at sf0.001 / 0.01 /
0.1 (lineitem 6k -> 60k -> 600k rows; documents 500 -> 500 -> 5k) and
print sec per sf as ONE JSON line. The point is the SHAPE of the curve:
a plan whose cost is dominated by per-stage fixed overhead at these
sizes should grow far slower than the data (good — the overhead
amortizes at scale); anything super-linear is a red flag to fix.

Usage: python tools/scaling.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402

SFS = ("0.001", "0.01", "0.1")
DEFAULT = (
    "panel_base",          # scan + hash agg
    "rolling_features",    # window functions
    "pelt",                # applyInPandas kernel
    "pairwise_dtw",        # broadcast + C kernel
    "exact_dedup",         # md5 group
    "minhash_lsh_pairs",   # explode + band self-join
    "dup_ngram_stats",     # explode + two group-bys + join
    "lsh_dedup_keep_first",  # signature window + id join
    "pii_scrub",           # regex projection
    "cosine_topk",         # GEMM
    # round-7: the newly DISTRIBUTED fit layer — cost should be
    # dominated by fixed per-aggregation overhead, near-flat in rows
    "quantile_regression",  # 11 sufficient-stats aggs (IRLS)
    "global_forecast",      # id-code join + ridge stats agg + decode
    "stacking_forecast",    # 2 base fits + meta stats agg
    # round-8 (VERDICT r7 #3): the five r7 curation ops at all three
    # sfs — trim_duplicate_spans is the one to watch (per-gram
    # positional explode: gram occurrences grow linearly with corpus
    # tokens, but the covered-position explode is where a pathological
    # dup-heavy corpus could go super-linear)
    "gopher_repetition",        # tagged gram pass, 3 doc-keyed aggs
    "benchmark_decontaminate",  # broadcast gram join, one corpus scan
    "trim_duplicate_spans",     # positional explode + owner join
    "domain_stats",             # host extract + two linear aggs
    "audio_frame_features",     # mapInPandas decode + array exprs
    # round-8 additions
    "ngram_lm_score",           # LM count aggs + broadcast joins
    "dsir_importance",          # hashed-gram multinomial ratio
    "perplexity_buckets",       # LM + per-language rank window
    # round-9 additions
    "dsir_resample",            # Gumbel-top-k (TakeOrderedAndProject)
    "perplexity_buckets_sampled",  # sampled cutoffs + broadcast assign
    "corpus_curation_v2",       # composed CCNet-order DAG
    "sequence_pack",            # md5 shard + in-shard cumsum window
    "sequence_pack_bins",       # per-shard next-fit kernel
    "c4_line_filters",          # zero-shuffle line-level projection
)


def main():
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark("polars-ts-spark-scaling")
    qs = queries()
    # warm JVM + python worker pool once
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    import pandas as pd  # noqa: PLC0415

    warm = spark.createDataFrame(pd.DataFrame({"k": list(range(32)), "v": [0.0] * 32}))
    warm.repartition(32, "k").groupBy("k").applyInPandas(
        lambda p: p, schema="k long, v double"
    ).write.format("noop").mode("overwrite").save()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        out[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            out[name][sf] = round(min(samples), 3)
    print(json.dumps({"sec_by_sf": out, "sfs": SFS}))


if __name__ == "__main__":
    main()
