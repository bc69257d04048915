"""Differential fuzz: the text-pipeline oracles hold on RANDOM corpora,
not just the driver's fixed documents table. Each case builds a seeded
corpus (skewed vocab for duplicate pressure, exact dups, short docs
below the shingle width, injected PII, mixed languages), writes it to
parquet, and compares every Spark operator against its DuckDB oracle
with the same normalize-sort-compare the correctness gate uses."""

from __future__ import annotations

import importlib.util
import os
import random
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_ts_spark.operators import textops

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_correctness.py"),
)
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)
normalize = _cc.normalize


def _make_corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)] + list(
        textops.LANG_MARKERS["en"]) + list(textops.LANG_MARKERS["de"])
    rows = []
    for d in range(n_docs):
        kind = rng.random()
        if kind < 0.1:  # short doc (below shingle width)
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 2)))
        elif kind < 0.25 and rows:  # exact dup of an earlier doc
            text = rng.choice(rows)[1]
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
            if rng.random() < 0.2:  # inject PII
                toks.insert(rng.randrange(len(toks)),
                            rng.choice(["u@ex.com", "https://ex.org/x",
                                        "+1 (415) 555-0000"]))
            text = " ".join(toks)
        rows.append((d, text, rng.choice(["en", "de", "fr"])))
    return rows


CASES = [
    ("exact_dedup",
     lambda df: textops.exact_dedup(df),
     lambda: textops.EXACT_DEDUP_ORACLE),
    ("text_stats",
     lambda df: textops.text_stats(df),
     lambda: textops.TEXT_STATS_ORACLE),
    ("token_counts",
     lambda df: textops.token_counts(df),
     lambda: textops.TOKEN_COUNTS_ORACLE),
    ("minhash_lsh_pairs",
     lambda df: textops.minhash_lsh_pairs(df, threshold=0.5),
     lambda: textops.minhash_lsh_oracle()),
    ("dup_ngram_stats",
     lambda df: textops.dup_ngram_stats(df, n=3),
     lambda: textops.dup_ngram_stats_oracle(n=3)),
    ("stratified_sample",
     lambda df: textops.stratified_sample(df, frac=0.3, by="lang"),
     lambda: textops.stratified_sample_oracle(frac=0.3, by="lang")),
    ("pii_scrub",
     lambda df: textops.pii_scrub(df),
     lambda: textops.pii_scrub_oracle()),
    ("lsh_dedup_keep_first",
     lambda df: textops.lsh_dedup_keep_first(df.withColumn(
         "ds", F.expr("timestamp_seconds(unix_seconds("
                      "timestamp'2024-01-01 00:00:00') + doc_id)"))),
     lambda: textops.lsh_dedup_keep_first_oracle()),
]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_text_oracles_on_random_corpus(spark, seed):
    rows = _make_corpus(seed)
    tmp = tempfile.mkdtemp(prefix="fuzz_docs_")
    try:
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        path = os.path.join(tmp, "documents.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        sdf_src = spark.read.parquet(path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
        for name, spark_fn, oracle_fn in CASES:
            a = normalize(spark_fn(sdf_src).toPandas())
            b = normalize(con.execute(oracle_fn()).df())
            assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
            assert list(a.columns) == list(b.columns), f"{name}: cols differ"
            assert a.equals(b), (
                f"{name}: value mismatch on seed {seed}\n"
                f"spark:\n{a[(a != b).any(axis=1)].head(3)}\n"
                f"oracle:\n{b[(a != b).any(axis=1)].head(3)}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("seed", [5, 17])
def test_embedding_oracles_on_random_vectors(spark, seed):
    import numpy as np

    from polars_ts_spark.operators import embedsim

    rng = np.random.default_rng(seed)
    # the oracle dot/norm expand to the corpus dimensionality (embedsim.DIM)
    n, dim = 80, embedsim.DIM
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    # plant a few near-dups so the 0.95 threshold fires
    for i in range(0, 12, 3):
        vecs[i + 1] = vecs[i] + rng.normal(scale=1e-3, size=dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    tmp = tempfile.mkdtemp(prefix="fuzz_emb_")
    try:
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        path = os.path.join(tmp, "embeddings.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')")
        for name, sdf, sql in [
            ("brute_force_topk", embedsim.brute_force_topk(src, k=3),
             embedsim.brute_force_topk_oracle(k=3)),
            ("cosine_dedup_pairs", embedsim.cosine_dedup_pairs(src, threshold=0.95),
             embedsim.cosine_dedup_oracle(0.95)),
        ]:
            a = normalize(sdf.toPandas())
            b = normalize(con.execute(sql).df())
            assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
            assert a.equals(b), f"{name}: mismatch on seed {seed}"
        # and the planted near-dups were actually found
        found = embedsim.cosine_dedup_pairs(src, threshold=0.95).count()
        assert found >= 4
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
