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
    # round-10 additions
    "corpus_curation_v2_sampled",   # held-out LM + sampled cutoffs
    "corpus_curation_v3",           # C4 line filter -> full CCNet DAG
    "sequence_pack_manifest",       # writer leg, 1 exchange
    "sequence_pack_bins_manifest",  # writer leg over the bins kernel
)


# the documents-backed queries eligible for the 100x tier
_DOCS_ONLY = {
    "exact_dedup", "minhash_lsh_pairs", "dup_ngram_stats",
    "lsh_dedup_keep_first", "pii_scrub", "gopher_repetition",
    "benchmark_decontaminate", "trim_duplicate_spans", "domain_stats",
    "ngram_lm_score", "dsir_importance", "perplexity_buckets",
    "dsir_resample", "perplexity_buckets_sampled", "corpus_curation_v2",
    "sequence_pack", "sequence_pack_bins", "c4_line_filters",
    "corpus_curation", "decontaminate_sharded", "stratified_sample",
    "text_stats", "language_id", "token_counts", "doc_fingerprint",
    "simhash_pairs", "ngram_jaccard_pairs", "exact_dedup_keep_first",
    "corpus_curation_v2_sampled", "corpus_curation_v3",
    "sequence_pack_manifest", "sequence_pack_bins_manifest",
    "dsir_pipeline", "dsir_importance_smallvocab",
}


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
    # round-10 (VERDICT r9 #5): the shipped sfs grow `documents` only
    # 10x — set SPARK_GRAFT_SCALE100_DIR to a dir holding the
    # 100x-docs corpus (tools/make_scale_corpus.py) to add a "100x"
    # column for the documents-backed queries. Queries that read other
    # tables skip it (the dir only carries documents.parquet).
    tiers: list[tuple[str, str]] = [
        (sf, f"/root/testdata/sf{sf}") for sf in SFS]
    x100 = os.environ.get("SPARK_GRAFT_SCALE100_DIR")
    if x100 and os.path.exists(os.path.join(x100, "documents.parquet")):
        tiers.append(("100x", x100))
    out: dict[str, dict[str, float]] = {}
    for name in names:
        out[name] = {}
        for label, sf_dir in tiers:
            if label == "100x":
                have = {f.split(".")[0] for f in os.listdir(sf_dir)}
                need_other = name not in _DOCS_ONLY
                if need_other and not {"lineitem", "events"} <= have:
                    continue
            samples = []
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
            except Exception as exc:  # non-documents query on the 100x dir
                out[name][label] = f"err: {str(exc)[:80]}"
                continue
            out[name][label] = round(min(samples), 3)
    print(json.dumps({"sec_by_sf": out, "sfs": [t[0] for t in tiers]}))


if __name__ == "__main__":
    main()
