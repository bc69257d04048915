"""Streaming layer: partial_fit parity with batch kernels, sliding
buffers, and the Structured Streaming state recursion (run with a file
stream + availableNow trigger, results collected from a memory sink)."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from polars_ts_spark.streaming.online import (
    OnlineSGDRegressor,
    SlidingWindowManager,
    StreamingETS,
    StreamingGlobalForecaster,
    StreamingKalmanFilter,
)


def _panel(n=60, ids=("a", "b"), fn=lambda t: t * 1.0):
    ts = pd.date_range("2024-01-01", periods=n, freq="D")
    return pd.concat([
        pd.DataFrame({"unique_id": sid, "ds": ts, "y": fn(np.arange(n)) + i})
        for i, sid in enumerate(ids)
    ])


def test_sliding_window_manager_evicts():
    m = SlidingWindowManager(window_size=3)
    m.extend("a", [1, 2, 3, 4, 5])
    assert list(m.get("a")) == [3, 4, 5]
    assert m.series_ids() == ["a"]


def test_streaming_ets_incremental_equals_batch():
    pdf = _panel(60)
    full = StreamingETS(method="holt").fit(pdf)
    inc = StreamingETS(method="holt").fit(pdf.iloc[: 2 * 30])  # first half (both ids interleaved)
    # split by time instead: first 30 days then rest
    cut = pdf["ds"].iloc[29]
    inc = StreamingETS(method="holt").fit(pdf[pdf["ds"] <= cut])
    inc.partial_fit(pdf[pdf["ds"] > cut])
    p_full = full.predict(3).set_index(["unique_id", "step"])["y_hat"]
    p_inc = inc.predict(3).set_index(["unique_id", "step"])["y_hat"]
    assert np.allclose(p_full.to_numpy(), p_inc.to_numpy(), atol=1e-12)


def test_streaming_ets_new_ids_bootstrapped():
    m = StreamingETS(method="ses")
    m.fit(_panel(20, ids=("a",)))
    m.partial_fit(_panel(20, ids=("b",)))
    assert set(m.state) == {"a", "b"}


def test_streaming_ets_holt_tracks_trend():
    m = StreamingETS(method="holt", alpha=0.5, beta=0.3).fit(_panel(100))
    pred = m.predict(2)
    a2 = pred[(pred["unique_id"] == "a") & (pred["step"] == 2)]["y_hat"].iloc[0]
    assert abs(a2 - 101.0) < 2.0  # line continues


def test_streaming_kalman_incremental_equals_batch():
    pdf = _panel(50)
    cut = pdf["ds"].iloc[24]
    full = StreamingKalmanFilter().fit(pdf)
    inc = StreamingKalmanFilter().fit(pdf[pdf["ds"] <= cut]).partial_fit(pdf[pdf["ds"] > cut])
    assert np.allclose(
        full.predict().set_index("unique_id")["y_hat"].to_numpy(),
        inc.predict().set_index("unique_id")["y_hat"].to_numpy(),
        atol=1e-12,
    )


def test_online_sgd_learns_line():
    rng = np.random.default_rng(0)
    X = rng.random((2000, 2))
    y = 2 * X[:, 0] + 3 * X[:, 1] + 1
    est = OnlineSGDRegressor(lr=0.5)
    for i in range(0, 2000, 100):
        est.partial_fit(X[i:i + 100], y[i:i + 100])
    assert np.mean(np.abs(est.predict(X) - y)) < 0.2


def test_streaming_global_forecaster():
    m = StreamingGlobalForecaster(lags=(1, 2), window_size=30, lr=0.5)
    pdf = _panel(120)
    for start in range(0, 120, 30):  # four micro-batches by time
        lo, hi = pdf["ds"].iloc[start], pdf["ds"].iloc[min(start + 29, 119)]
        m.partial_fit(pdf[(pdf["ds"] >= lo) & (pdf["ds"] <= hi)])
    pred = m.predict(1)
    a1 = pred[pred["unique_id"] == "a"]["y_hat"].iloc[0]
    assert abs(a1 - 120.0) < 15.0  # learned roughly the trend


def test_structured_streaming_ets_state(spark):
    """Real Structured Streaming run: parquet file source ->
    applyInPandasWithState -> memory sink, availableNow trigger."""
    from polars_ts_spark.streaming.structured import streaming_ets_update

    tmp = tempfile.mkdtemp(prefix="stream_src_")
    try:
        pdf = _panel(40)
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = streaming_ets_update(stream, method="holt")
        q = (
            out.writeStream.format("memory")
            .queryName("ets_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM ets_state").toPandas()
        assert set(res["unique_id"]) == {"a", "b"}
        assert (res["n_obs"] == 40).all()
        # state matches the batch kernel exactly
        batch = StreamingETS(method="holt").fit(pdf)
        for sid in ("a", "b"):
            lvl = res[res["unique_id"] == sid]["level"].iloc[-1]
            assert lvl == pytest.approx(batch.state[sid]["level"], abs=1e-9)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_tumbling_event_aggregate(spark):
    from polars_ts_spark.streaming.structured import tumbling_event_aggregate

    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:20"])
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "u", "ds": ts, "y": [1.0, 2.0, 4.0]}))
    out = tumbling_event_aggregate(df, "1 hour").toPandas().sort_values("window_start")
    assert list(out["n_events"]) == [2, 1]
    assert list(out["y_sum"]) == [3.0, 4.0]


def test_watermarked_stream_window_counts(spark):
    """Watermarked windowed aggregation on a real stream."""
    from polars_ts_spark.streaming.structured import watermarked_event_counts

    tmp = tempfile.mkdtemp(prefix="stream_wm_")
    try:
        ts = pd.date_range("2024-01-01", periods=48, freq="30min")
        pdf = pd.DataFrame({"unique_id": "u", "ds": ts, "y": np.ones(48)})
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = watermarked_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("wm_counts")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM wm_counts").toPandas()
        # append mode only emits windows the watermark has closed
        assert (res["n_events"] == 2).all()
        assert len(res) >= 20
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_kalman_update_matches_driver_class(spark):
    """The distributed batch fold (streaming_kalman_update) must equal
    the driver-dict StreamingKalmanFilter state exactly — the same
    parity law the ETS path has."""
    from polars_ts_spark.streaming.structured import streaming_kalman_update

    pdf = _panel(50)
    sdf = spark.createDataFrame(pdf)
    out = streaming_kalman_update(sdf).toPandas().set_index("unique_id")
    ref = StreamingKalmanFilter().fit(pdf)
    for sid, (x, p) in ref.state.items():
        assert out.loc[sid, "x"] == pytest.approx(x, abs=1e-12)
        assert out.loc[sid, "p"] == pytest.approx(p, abs=1e-12)
        assert out.loc[sid, "n_obs"] == 50


def test_structured_streaming_kalman_state(spark):
    """Real Structured Streaming run of the Kalman fold: parquet file
    source -> applyInPandasWithState -> memory sink; final state equals
    the driver-dict filter exactly."""
    from polars_ts_spark.streaming.structured import streaming_kalman_update

    tmp = tempfile.mkdtemp(prefix="stream_kal_")
    try:
        pdf = _panel(40)
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = streaming_kalman_update(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("kal_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM kal_state").toPandas()
        assert set(res["unique_id"]) == {"a", "b"}
        ref = StreamingKalmanFilter().fit(pdf)
        for sid in ("a", "b"):
            row = res[res["unique_id"] == sid].iloc[-1]
            x, p = ref.state[sid]
            assert row["x"] == pytest.approx(x, abs=1e-12)
            assert row["p"] == pytest.approx(p, abs=1e-12)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_exact_dedup_bounded_state(spark):
    """Real Structured Streaming run of the fingerprint dedup: parquet
    source -> dropDuplicatesWithinWatermark -> memory sink. The kept set
    must carry exactly one row per distinct text (which duplicate wins
    follows arrival order; the deterministic batch twin is
    exact_dedup_keep_first, oracle-gated)."""
    import pandas as pd

    from polars_ts_spark.operators.textops import exact_dedup_keep_first
    from polars_ts_spark.streaming.structured import streaming_exact_dedup

    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        pdf = pd.DataFrame({
            "doc_id": range(8),
            "ds": pd.date_range("2024-01-01", periods=8, freq="min"),
            "text": ["alpha beta", "gamma", "alpha beta", "delta",
                     "gamma", "alpha beta", "epsilon", "zeta"],
        })
        df = spark.createDataFrame(pdf)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        q = (
            streaming_exact_dedup(stream, watermark="10 minutes")
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM dedup_stream").toPandas()
        batch = exact_dedup_keep_first(df).toPandas()
        assert len(res) == len(batch) == 5  # 8 docs, 5 distinct texts
        assert set(res["fingerprint"]) == set(batch["fingerprint"])
        assert res["fingerprint"].is_unique
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_lsh_dedup_matches_batch_twin(spark):
    """Real Structured Streaming run of the LSH near-dup dedup: two
    parquet files -> maxFilesPerTrigger=1 -> foreachBatch incremental
    handler with a parquet seen-key state. The kept set must equal the
    batch twin lsh_dedup_keep_first over the full corpus (batches split
    in event-time order)."""
    import os

    import pandas as pd

    from polars_ts_spark.operators.textops import lsh_dedup_keep_first
    from polars_ts_spark.streaming.structured import streaming_lsh_dedup_handler

    base = tempfile.mkdtemp(prefix="stream_lsh_")
    src, kept_dir, seen_dir = (os.path.join(base, d) for d in ("src", "kept", "seen"))
    try:
        texts = [
            "the quick brown fox jumps over the lazy dog today",   # 0 kept
            "the quick brown fox jumps over the lazy dog today",   # 1 exact dup
            "a completely different document about spark engines", # 2 kept
            "the quick brown fox jumps over the sleepy dog today", # 3 near dup of 0
            "a completely different document about spark engines", # 4 dup of 2 (batch 2)
            "yet another unrelated piece of text entirely here",   # 5 kept
        ]
        pdf = pd.DataFrame({
            "doc_id": range(6),
            "ds": pd.date_range("2024-01-01", periods=6, freq="min"),
            "text": texts,
        })
        df = spark.createDataFrame(pdf)
        os.makedirs(src, exist_ok=True)
        # two files in event-time order; mtimes force source order
        df.filter("doc_id < 4").coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b0"))
        df.filter("doc_id >= 4").coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b1"))
        now = 1_700_000_000
        for i, sub in enumerate(("b0", "b1")):
            for fn in os.listdir(os.path.join(src, sub)):
                os.utime(os.path.join(src, sub, fn), (now + i * 60, now + i * 60))
        schema = spark.read.parquet(os.path.join(src, "b0")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        handler = streaming_lsh_dedup_handler(kept_dir, seen_dir)
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["doc_id"] for r in spark.read.parquet(kept_dir).collect()}
        batch = {r["doc_id"] for r in lsh_dedup_keep_first(df).collect()}
        assert got == batch
        assert 0 in got and 2 in got and 5 in got
        assert 1 not in got and 4 not in got  # exact dups dropped
        # at-least-once replay of the last batch must be a no-op:
        # partitioned overwrite + batch<batch_id state filter
        handler(df.filter("doc_id >= 4"), 1)
        replayed = {r["doc_id"] for r in spark.read.parquet(kept_dir).collect()}
        assert replayed == got
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stateless_curation_projections_run_on_streams(spark):
    """pii_scrub / token_counts / text_stats are pure projections, so
    the SAME operator code must run unchanged on a readStream source —
    no hidden sort/window/collect that would break streaming."""
    import pandas as pd

    from polars_ts_spark.operators import textops

    tmp = tempfile.mkdtemp(prefix="stream_proj_")
    try:
        pdf = pd.DataFrame({
            "doc_id": range(6),
            "text": ["mail me at a@b.co now", "plain text only here",
                     "see https://ex.org/d ok", "short one",
                     "call +1 (415) 555-0000 today", "the quick brown fox"],
        })
        df = spark.createDataFrame(pdf)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = textops.pii_scrub(stream)
        q = (
            out.writeStream.format("memory").queryName("curation_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM curation_stream").toPandas()
        batch = textops.pii_scrub(df).toPandas()
        assert sorted(res["clean_text"]) == sorted(batch["clean_text"])
        assert int(res["n_emails"].sum()) == 1 and int(res["n_phones"].sum()) == 1
        # token_counts and text_stats also plan on streams (stateless)
        assert textops.token_counts(stream).isStreaming
        assert textops.text_stats(stream).isStreaming
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_decontaminate_matches_batch_twin(spark):
    """Real Structured Streaming run of the stateless decontamination:
    parquet source -> broadcast benchmark gram set via mapInPandas ->
    memory sink, append mode. Per-doc output must equal the batch twin
    textops.decontaminate over the same corpus."""
    import pandas as pd

    from polars_ts_spark.operators.textops import decontaminate
    from polars_ts_spark.streaming.structured import streaming_decontaminate

    tmp = tempfile.mkdtemp(prefix="stream_decon_")
    try:
        pdf = pd.DataFrame({
            "doc_id": range(4),
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota",  # hit
                "one two three four five six seven eight nine",        # clean
                "tiny",                                                # no 8-gram
                "alpha beta gamma delta epsilon zeta eta theta",       # exact bench
            ],
        })
        df = spark.createDataFrame(pdf)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        bench = spark.createDataFrame(pd.DataFrame({
            "doc_id": [100],
            "text": ["alpha beta gamma delta epsilon zeta eta theta"],
        }))
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        q = (
            streaming_decontaminate(stream, bench)
            .writeStream.format("memory")
            .queryName("decon_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM decon_stream").toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        batch = decontaminate(df, bench).toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            res.astype({"contaminated": "int64"}),
            batch.astype({"contaminated": "int64"}),
        )
        assert res["contaminated"].tolist() == [1, 0, 0, 1]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_curation_pipeline_composed(spark):
    """Round-8 directive #8: ONE readStream graph composing watermarked
    exact dedup (dropDuplicatesWithinWatermark — bounded state) ->
    benchmark decontamination (stream-static broadcast join) -> quality
    flags -> per-window rollup in append mode, fed 3 micro-batches
    (maxFilesPerTrigger=1) including a LATE row inside the watermark
    and a cross-micro-batch duplicate. Expected values composed
    independently from the batch ops."""
    import pandas as pd

    from polars_ts_spark.operators import textops
    from polars_ts_spark.streaming.structured import streaming_curation_pipeline

    base = tempfile.mkdtemp(prefix="stream_curation_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    T = pd.Timestamp("2024-01-01 10:00:00")
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    good = ("the cat sat on the mat and it was a very good day for all of "
            "us to be here with some friends and family members around the "
            "house and the garden in the sun with a book about the sea")
    def at(**kw):
        return (T + pd.Timedelta(**kw)).to_pydatetime()

    rows1 = [
        (0, bench_text + " extra", at(seconds=5)),    # window A, contaminated
        (2, "aa bb", at(seconds=20)),                 # window A, low quality
        (4, good + " window b tail", at(seconds=70)),  # window B
    ]
    rows2 = [
        (3, good, at(seconds=50)),                    # window A, LATE (batch 2)
        (1, bench_text + " extra", at(seconds=45)),   # dup of doc 0 text
        (5, "xx " + bench_text, at(seconds=90)),      # window B, contaminated
        (6, None, at(seconds=95)),                    # window B, NULL text
    ]
    rows3 = [  # sentinel pushes the watermark past windows A and B
        (9, "sentinel future doc closes the watermark", at(minutes=30)),
    ]
    schema = "doc_id long, text string, ts timestamp"
    try:
        for i, rows in enumerate((rows1, rows2, rows3)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                os.path.join(src, f"f{i}"))
        bench = spark.createDataFrame(
            [(100, bench_text)], "doc_id long, text string")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = streaming_curation_pipeline(
            stream, bench, watermark="2 minutes", window="1 minute")
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("curation_pipeline")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        res = {
            r["window_start"]: r
            for r in spark.sql("SELECT * FROM curation_pipeline").collect()
        }
        # expected, composed from the BATCH ops: doc 1 deduped away
        # (same text as doc 0, same window), flags from text_stats
        batch = spark.createDataFrame(rows1 + rows2, schema)
        qscore = {r["doc_id"]: r["quality_score"]
                  for r in textops.text_stats(batch).collect()}
        ntok = {d: len(t.split(" ")) for d, t, _ in rows1 + rows2 if t}
        win_a, win_b = T.to_pydatetime(), (T + pd.Timedelta(minutes=1)).to_pydatetime()
        assert set(res) == {win_a, win_b}  # sentinel window never finalizes
        a, b = res[win_a], res[win_b]
        assert a["n_docs"] == 3 and a["n_contaminated"] == 1
        assert a["n_quality_ok"] == sum(
            int(qscore[d] >= 0.5) for d in (0, 2, 3))
        assert a["total_tokens"] == ntok[0] + ntok[2] + ntok[3]
        # NULL-text doc 6 counts as a doc but contributes 0 tokens,
        # 0 contamination, 0 quality-ok (not a -1 from size(split(NULL)))
        assert b["n_docs"] == 3 and b["n_contaminated"] == 1
        assert b["n_quality_ok"] == sum(int(qscore[d] >= 0.5) for d in (4, 5))
        assert b["total_tokens"] == ntok[4] + ntok[5]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_lm_score_matches_batch_twin(spark):
    """The stateless streaming LM scorer must reproduce the batch
    ngram_lm_score (reference-trained) on a replayed corpus — hashed
    counts and kernel float order only move last bits, so compare at
    6 dp like the oracle gate."""
    from polars_ts_spark.operators.textops import ngram_lm_score
    from polars_ts_spark.streaming.structured import streaming_lm_score

    tmp = tempfile.mkdtemp(prefix="stream_lm_")
    try:
        ref = spark.createDataFrame(
            [(100, "the cat sat on the mat the cat ran off"),
             (101, "a dog sat on a rug and a dog ran")],
            ["doc_id", "text"])
        rows = [
            (0, "the cat sat on the mat"),
            (1, "zz yy xx ww vv uu"),
            (2, "a dog ran off"),
            (3, "solo"),           # 1 token: no bigram, dropped
            (4, None),             # NULL text: dropped (no bigram)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        q = (
            streaming_lm_score(stream, ref)
            .writeStream.format("memory").queryName("lm_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: (r["n_bigrams"], round(r["cross_entropy"], 6),
                          round(r["perplexity"], 6))
            for r in spark.sql("SELECT * FROM lm_stream").collect()
        }
        want = {
            r["doc_id"]: (r["n_bigrams"], round(r["cross_entropy"], 6),
                          round(r["perplexity"], 6))
            for r in ngram_lm_score(df, reference=ref).collect()
        }
        assert got == want and set(got) == {0, 1, 2}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_curation_pipeline_lm_leg(spark):
    """Round-9 directive #5: the composed streaming curation graph
    gains the CCNet LM leg — arriving docs are scored by the
    broadcast bigram LM BEFORE the watermark/dedup stages and the
    windowed rollup adds n_lm_ok. Expected counts composed from the
    BATCH ngram_lm_score over the same corpus; unscoreable docs
    (1-token, NULL text) count as not-ok."""
    import pandas as pd

    from polars_ts_spark.operators.textops import ngram_lm_score
    from polars_ts_spark.streaming.structured import streaming_curation_pipeline

    base = tempfile.mkdtemp(prefix="stream_curation_lm_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    T = pd.Timestamp("2024-01-01 10:00:00")
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    lm_ref = spark.createDataFrame(
        [(200, "the cat sat on the mat the cat ran off and the dog sat"),
         (201, "a dog sat on a rug and a dog ran off to the mat")],
        ["doc_id", "text"])

    def at(**kw):
        return (T + pd.Timedelta(**kw)).to_pydatetime()

    rows1 = [
        (0, "the cat sat on the mat", at(seconds=5)),     # window A, in-LM
        (1, "zz yy xx ww vv uu", at(seconds=20)),         # window A, OOV
        (2, "solo", at(seconds=40)),                      # window A, unscoreable
    ]
    rows2 = [
        (3, "a dog ran off", at(seconds=70)),             # window B, in-LM
        (4, None, at(seconds=80)),                        # window B, NULL text
        (5, "the cat sat on the mat", at(seconds=30)),    # dup of 0 (window A)
    ]
    rows3 = [(9, "sentinel future doc closes the watermark", at(minutes=30))]
    schema = "doc_id long, text string, ts timestamp"
    try:
        for i, rows in enumerate((rows1, rows2, rows3)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                os.path.join(src, f"f{i}"))
        bench = spark.createDataFrame(
            [(100, bench_text)], "doc_id long, text string")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        # threshold chosen between the in-LM and OOV perplexities
        batch = spark.createDataFrame(rows1 + rows2, schema)
        ppl = {r["doc_id"]: r["perplexity"]
               for r in ngram_lm_score(batch, reference=lm_ref).collect()}
        assert ppl[0] < ppl[1]  # in-LM text scores cleaner than OOV
        thr = (ppl[0] + ppl[1]) / 2
        out = streaming_curation_pipeline(
            stream, bench, watermark="2 minutes", window="1 minute",
            lm_reference=lm_ref, lm_ppl_max=thr)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("curation_lm")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        res = {r["window_start"]: r
               for r in spark.sql("SELECT * FROM curation_lm").collect()}
        win_a = T.to_pydatetime()
        win_b = (T + pd.Timedelta(minutes=1)).to_pydatetime()
        assert set(res) == {win_a, win_b}
        a, b = res[win_a], res[win_b]
        # window A: docs 0, 1, 2 (dup 5 removed); only doc 0 passes the LM
        assert a["n_docs"] == 3 and a["n_lm_ok"] == 1
        # window B: docs 3 (passes) and 4 (NULL -> unscoreable -> not ok)
        assert b["n_docs"] == 2 and b["n_lm_ok"] == int(ppl[3] <= thr)
        assert ppl[3] <= thr  # the in-LM doc does pass
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_curation_pipeline_line_filter_leg(spark):
    """Round-10 directive #6: the composed streaming graph gains the
    C4 line-filter leg in the published order — line cleaning FIRST,
    so the dedup key, quality score and token rollup all see
    clean_text. Asserts: a doc failing the doc-level verdict is
    dropped, a NULL-text doc is dropped (NULL verdict is not true),
    and two docs whose RAW texts differ but whose CLEANED texts
    coincide dedup to one."""
    import pandas as pd

    from polars_ts_spark.operators import textops
    from polars_ts_spark.streaming.structured import streaming_curation_pipeline

    base = tempfile.mkdtemp(prefix="stream_curation_c4_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    T = pd.Timestamp("2024-01-01 10:00:00")

    def at(**kw):
        return (T + pd.Timedelta(**kw)).to_pydatetime()

    rows1 = [
        (0, "aa bb cc line dd", at(seconds=5)),   # A: clean -> 'aa bb cc'
        (1, "x line y", at(seconds=20)),          # A: no line survives -> drop
        (2, "aa bb cc line zz", at(seconds=30)),  # A: SAME clean text as 0
    ]
    rows2 = [
        (3, None, at(seconds=40)),                # NULL text -> dropped
        (4, "pp qq line rr ss", at(seconds=70)),  # B: both lines survive
    ]
    rows3 = [(9, "sentinel future doc closes the watermark", at(minutes=30))]
    schema = "doc_id long, text string, ts timestamp"
    LF = dict(line_sep=" line ", min_words_per_line=2, min_lines=1,
              require_terminal_punct=False)
    try:
        for i, rows in enumerate((rows1, rows2, rows3)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                os.path.join(src, f"f{i}"))
        bench = spark.createDataFrame(
            [(100, "rr ss")], "doc_id long, text string")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = streaming_curation_pipeline(
            stream, bench, n=2, watermark="2 minutes", window="1 minute",
            line_filter=LF)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("curation_c4")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        res = {r["window_start"]: r
               for r in spark.sql("SELECT * FROM curation_c4").collect()}
        win_a = T.to_pydatetime()
        win_b = (T + pd.Timedelta(minutes=1)).to_pydatetime()
        assert set(res) == {win_a, win_b}
        a, b = res[win_a], res[win_b]
        # window A: doc 1 dropped by the line filter, doc 2's CLEANED
        # text duplicates doc 0's -> one survivor
        assert a["n_docs"] == 1
        assert a["total_tokens"] == 3  # 'aa bb cc'
        assert a["n_contaminated"] == 0
        # window B: doc 3 (NULL) dropped, doc 4 kept with its rejoined
        # clean text; its 'rr ss' bigram hits the benchmark
        assert b["n_docs"] == 1
        assert b["total_tokens"] == 5  # 'pp qq line rr ss'
        assert b["n_contaminated"] == 1
        # the batch twin agrees on the clean texts the stream scored
        batch = spark.createDataFrame(rows1 + rows2, schema)
        clean = {r["doc_id"]: r for r in textops.c4_line_filters(
            batch, **LF).collect()}
        assert clean[0]["kept"] and clean[0]["clean_text"] == "aa bb cc"
        assert not clean[1]["kept"]
        assert clean[2]["clean_text"] == clean[0]["clean_text"]
        assert clean[3]["kept"] is None
        assert clean[4]["kept"] and clean[4]["clean_text"] == "pp qq line rr ss"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_curation_pipeline_full_order(spark):
    """line_filter + lm_reference COMPOSED in one graph — the complete
    published order (C4 line cleaning -> LM scoring -> dedup ->
    decontaminate -> rollup): the LM must score the CLEANED text, so a
    doc whose junk lines would have wrecked its perplexity passes the
    LM gate once the line filter strips them."""
    import pandas as pd
    from pyspark.sql import functions as F

    from polars_ts_spark.operators.textops import c4_line_filters, ngram_lm_score
    from polars_ts_spark.streaming.structured import streaming_curation_pipeline

    base = tempfile.mkdtemp(prefix="stream_curation_full_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    T = pd.Timestamp("2024-01-01 10:00:00")

    def at(**kw):
        return (T + pd.Timedelta(**kw)).to_pydatetime()

    lm_ref = spark.createDataFrame(
        [(200, "the cat sat on the mat the cat ran off and the dog sat")],
        ["doc_id", "text"])
    # doc 0: in-LM clean line + an OOV junk line the filter strips
    rows1 = [
        (0, "the cat sat on the mat line zz", at(seconds=5)),
        (1, "qq ww ee rr tt yy uu line ii", at(seconds=20)),  # OOV even cleaned
    ]
    rows3 = [(9, "sentinel future doc closes the watermark", at(minutes=30))]
    schema = "doc_id long, text string, ts timestamp"
    LF = dict(line_sep=" line ", min_words_per_line=2, min_lines=1,
              require_terminal_punct=False)
    try:
        for i, rows in enumerate((rows1, rows3)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                os.path.join(src, f"f{i}"))
        bench = spark.createDataFrame(
            [(100, "never matches")], "doc_id long, text string")
        # threshold between the CLEANED perplexities of docs 0 and 1
        batch = spark.createDataFrame(rows1, schema)
        cleaned = c4_line_filters(batch, **LF).filter("kept").select(
            "doc_id", F.col("clean_text").alias("text"))
        ppl = {r["doc_id"]: r["perplexity"] for r in
               ngram_lm_score(cleaned, reference=lm_ref).collect()}
        raw_ppl = {r["doc_id"]: r["perplexity"] for r in
                   ngram_lm_score(batch, reference=lm_ref).collect()}
        # the junk line raises doc 0's perplexity; the threshold sits
        # between CLEANED doc 0 and RAW doc 0, so the gate passes doc 0
        # only because the LM scored clean_text — that is what the
        # composed order buys. Doc 1 stays OOV even cleaned.
        assert ppl[0] < raw_ppl[0]
        thr = (ppl[0] + raw_ppl[0]) / 2
        assert ppl[1] > thr
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = streaming_curation_pipeline(
            stream, bench, n=2, watermark="2 minutes", window="1 minute",
            line_filter=LF, lm_reference=lm_ref, lm_ppl_max=thr)
        q = (
            out.writeStream.format("memory").queryName("curation_full")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        res = {r["window_start"]: r
               for r in spark.sql("SELECT * FROM curation_full").collect()}
        win_a = T.to_pydatetime()
        assert set(res) == {win_a}
        a = res[win_a]
        assert a["n_docs"] == 2
        assert a["n_lm_ok"] == 1  # cleaned doc 0 passes, doc 1 stays OOV
    finally:
        shutil.rmtree(base, ignore_errors=True)
