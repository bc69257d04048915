"""Similarity search over the ``embeddings`` table
(vec_id, embedding: array<float>, label): brute-force cosine top-k
(the exact baseline), deterministic-hyperplane LSH buckets (the scale
candidate-generation path), and embedding-cosine near-duplicate pairs.

Mandated extension beyond the reference surface (the reference has no
vector ops). Spark-first: dot products via ``aggregate(zip_with(...))``
higher-order functions — JVM-side, no Python in the hot path.

Determinism: cosine is computed in float64 as an explicit
left-associative sum (see ``_dot_expanded``), so Spark and the DuckDB
oracle perform the identical IEEE operation sequence and agree
bit-for-bit. The LSH hyperplanes are md5-derived pseudo-random
constants — no RNG, reproducible in SQL.

Scale notes (100 TB):
- brute_force_topk is O(n²) in corpus size — correct baseline only;
  its plan is a single shuffle-free broadcast-able cross join when one
  side is small (queries), else the LSH path below.
- lsh_ann_topk: each vector lands in one bucket per band (+1-bit
  multi-probe); candidate generation is an equi-join on bucket id
  (linear shuffle), then an exact GEMM re-rank within buckets. Recall
  is tunable by bands × bits.
- ivf_ann_topk: k-means inverted lists trained on a bounded md5-rank
  sample, exact-integer-grid trajectory (GEMM == SQL bitwise), n_probe
  cells scanned per query — the FAISS-style scale path.
- At 100 TB the corpus side would be bucketed-by parquet on the
  bucket/cell id so repeated queries skip the shuffle entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shared expressions


DIM = 64  # embedding dimensionality of the driver's corpus

# brute_force_topk collects the corpus to the driver before the broadcast
# GEMM; above this row count that is a driver-OOM pattern, so it routes to
# the LSH-bucketed ANN path instead (200k × 64 float64 ≈ 100 MB).
MAX_BROADCAST_ROWS = 200_000


def _as_double(col: str) -> F.Column:
    return F.col(col).cast("array<double>")


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + v * v)"))


# Exact-parity variants: the dot product written as an explicit
# left-associative 64-term sum. float32*float32 in float64 is exact
# (48-bit product < 53-bit mantissa) and both engines then perform the
# IDENTICAL addition sequence, so Spark and DuckDB agree bit-for-bit —
# HOF folds / list_dot_product may reassociate and differ by 1 ulp.
# Also faster: one codegen'd expression, no per-element lambda calls.


def _dot_expanded(a: str, b: str, dim: int = DIM) -> F.Column:
    return F.expr(" + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim)))


def _norm_expanded(a: str, dim: int = DIM) -> F.Column:
    return F.sqrt(F.expr(" + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(dim))))


def duck_dot(a: str, b: str, dim: int = DIM) -> str:
    # DuckDB lists are 1-indexed
    return " + ".join(f"{a}[{i + 1}] * {b}[{i + 1}]" for i in range(dim))


def duck_norm(a: str, dim: int = DIM) -> str:
    return f"sqrt({' + '.join(f'{a}[{i + 1}] * {a}[{i + 1}]' for i in range(dim))})"


# ---------------------------------------------------------------------------
# brute-force cosine top-k (exact baseline)


def brute_force_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector (self excluded).
    Output [vec_id, neighbor_id, cosine, rank], rank 1..k by
    (cosine desc, neighbor_id asc) — the deterministic tie-break.

    Plan: broadcast the (n×d) normalized matrix — it is the "small
    dim table" of this join (1M×128 floats = 512 MB, executor-memory
    scale) — and compute each task's block of the similarity matrix
    as one BLAS GEMM inside mapInPandas: S_block = M[rows] @ M.T.
    Replaces the n² cross-join rows with n/batch matmuls; the
    all-pairs JVM cross join was ~10x slower at 2k vectors. Beyond
    broadcastable n, the LSH-bucketed variant (lsh_ann_topk) is the
    scale path."""
    import pandas as pd

    spark = df.sparkSession
    base = df.select(id_col, vec_col).dropna()
    # Size-gate on a SCALAR before materializing anything on the driver:
    # count() first, collect only when the corpus fits. The router must
    # survive a corpus the exact path cannot.
    n = base.count()
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"vec_id {id_dtype}, neighbor_id {id_dtype}, cosine double, rank int"
    if n == 0:
        return spark.createDataFrame([], schema=schema)
    if n > MAX_BROADCAST_ROWS:
        # the corpus no longer fits a driver collect + broadcast — route to
        # the bucketed ANN path (approximate, linear shuffle)
        return lsh_ann_topk(df, k=k, id_col=id_col, vec_col=vec_col, dim=dim)
    pdf = base.toPandas()
    ids = pdf[id_col].to_numpy()
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    nrm = np.sqrt((M * M).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, M, nrm))

    def gen(batches):
        ids_b, Mb, nrm_b = bc.value
        for bdf in batches:
            rows = bdf["id"].to_numpy()
            S = (Mb[rows] @ Mb.T) / (nrm_b[rows, None] * nrm_b[None, :])
            S = np.round(S, 6)
            out_v, out_n, out_c, out_r = [], [], [], []
            for i, r in enumerate(rows):
                s = S[i].copy()
                s[ids_b == ids_b[r]] = -np.inf  # exclude self BY ID (dup-safe)
                order = np.lexsort((ids_b, -s))[:k]  # cos desc, id asc
                take = order[np.isfinite(s[order])]
                out_v.extend([ids_b[r]] * len(take))
                out_n.extend(ids_b[take])
                out_c.extend(s[take])
                out_r.extend(range(1, len(take) + 1))
            yield pd.DataFrame({
                "vec_id": out_v, "neighbor_id": out_n,
                "cosine": out_c, "rank": out_r,
            })

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    idx = spark.range(0, n).repartition(n_parts)
    return idx.mapInPandas(gen, schema=schema)


def brute_force_topk_oracle(k: int = 5) -> str:
    nrm = duck_norm("v")
    dot = duck_dot("a.v", "b.v")
    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {nrm} AS nrm
    FROM embeddings
),
scored AS (
    SELECT a.vec_id, b.vec_id AS neighbor_id,
           round(({dot}) / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT vec_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs


def cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup).
    Output [vec_id_1, vec_id_2, cosine], vec_id_1 < vec_id_2.
    Same flat-column plan as brute_force_topk.

    Size-gated: the exact O(n²) cross join only runs when the corpus is
    under MAX_BROADCAST_ROWS (checked via count(), a scalar — nothing is
    materialized first). Above the cap it routes to the banded
    hyperplane-LSH candidate path (`lsh_cosine_pairs`), which generates
    candidates with a linear shuffle and verifies exact cosine only on
    bucket collisions — the same exact-baseline-vs-LSH split as
    brute_force_topk / lsh_ann_topk."""
    if df.select(id_col, vec_col).dropna().count() > MAX_BROADCAST_ROWS:
        return lsh_cosine_pairs(df, threshold=threshold, id_col=id_col,
                                vec_col=vec_col, dim=dim)
    v = df.select(
        F.col(id_col),
        *[F.col(vec_col)[i].cast("double").alias(f"e{i}") for i in range(dim)],
    )
    v = v.withColumn(
        "nrm", F.sqrt(F.expr(" + ".join(f"e{i} * e{i}" for i in range(dim))))
    )
    a = v.select(
        F.col(id_col).alias("vec_id_1"),
        *[F.col(f"e{i}").alias(f"a{i}") for i in range(dim)],
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col(id_col).alias("vec_id_2"),
        *[F.col(f"e{i}").alias(f"b{i}") for i in range(dim)],
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(" + ".join(f"a{i} * b{i}" for i in range(dim)))
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .select("vec_id_1", "vec_id_2", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_dedup_oracle(threshold: float = 0.95) -> str:
    nrm = duck_norm("v")
    dot = duck_dot("a.v", "b.v")
    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {nrm} AS nrm
    FROM embeddings
)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(({dot}) / (a.nrm * b.nrm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(({dot}) / (a.nrm * b.nrm), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)


def _plane_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1],
    derived from md5 — reproducible anywhere, no RNG."""
    import hashlib

    h = int(hashlib.md5(f"plane_{plane}_{dim}".encode()).hexdigest()[:8], 16)
    return (h % 2000001) / 1000000.0 - 1.0


def random_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [[_plane_value(p, d) for d in range(dim)] for p in range(n_planes)]


def lsh_bucket_ids(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per vector: bit p of the
    bucket = sign(<v, plane_p>). Output [vec_id, bucket].

    The planes are deterministic constants folded into the plan
    (literal arrays) — Catalyst constant-folds them; the scan is one
    projection, no shuffle."""
    planes = random_hyperplanes(n_planes, dim)
    bucket = None
    for p, plane in enumerate(planes):
        dot = F.expr(
            f"aggregate(zip_with(cast({vec_col} as array<double>), "
            f"array({', '.join(repr(x) + 'D' for x in plane)}), (x, y) -> x * y), "
            f"0D, (acc, v) -> acc + v)"
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), bucket.alias("bucket"))


def _band_keys_udf(n_bands: int, bits: int, dim: int):
    """Vectorized Arrow UDF computing every band key in ONE GEMM per
    batch: signs of V(batch×dim) @ P.T(dim×n_bands·bits), bit-packed per
    band. Deterministic md5-derived planes (same `_plane_value` series
    as the SQL path). A per-bit literal expression tree (n_bands·bits·
    dim terms) OOMs Catalyst codegen; a zip_with/aggregate HOF is
    interpreted per element — the batched GEMM is both the fastest and
    the smallest plan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [[_plane_value(p, d) for d in range(dim)] for p in range(n_bands * bits)]
    )  # (n_bands*bits, dim)
    weights = (1 << np.arange(bits, dtype=np.int64))

    def _keys(vecs):
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits_m = (V @ P.T) > 0  # (n, n_bands*bits)
        b = bits_m.reshape(len(V), n_bands, bits)
        k = (b * weights[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(k))

    # no type hints: postponed annotations (PEP 563) break inference
    return pandas_udf(_keys, "array<int>")


def _bucket_topk_kernel(pdf, id_col: str, k: int, max_bucket: int):
    """Shared per-bucket exact-cosine top-k: queries = every row in the
    bucket, index = rows with is_member=1; one float64 GEMM per
    (split, query-block), cosines rounded to 6 decimals, ties broken on
    neighbor_id. Oversized buckets are deterministically re-split
    (Knuth multiplicative hash of the id — recall loss, not an error,
    per the ANN contract). Query rows are blocked so the similarity
    block never exceeds ~32 MB regardless of bucket size.

    The top-k selection is fully vectorized: the 6dp-rounded cosine
    maps EXACTLY to an int (|s|<=1 so s*1e6 is an integer after the
    round), which composes with the neighbor's dense id-rank into one
    distinct int64 sort key per candidate — (cosine desc, id asc)
    becomes a single argpartition+argsort over the block, no per-row
    Python loop (the loop was the kernel's scaling bottleneck: tens of
    µs per query row dwarfs the GEMM at billions of rows)."""
    import pandas as pd

    ids = pdf[id_col].to_numpy()
    mem = pdf["is_member"].to_numpy() == 1
    m = len(ids)
    if m < 2 or not mem.any():
        return pd.DataFrame({"vec_id": ids[:0], "neighbor_id": ids[:0],
                             "cosine": np.array([], dtype=np.float64)})
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    n_splits = -(-m // max_bucket)
    if n_splits > 1:
        try:
            key = ids.astype(np.int64)
        except (ValueError, TypeError):
            # string / non-numeric ids: deterministic md5-derived key
            # (the int fast path stays bit-identical for numeric ids)
            import hashlib

            key = np.frombuffer(
                b"".join(hashlib.md5(str(s).encode()).digest()[:8] for s in ids),
                dtype=">u8",
            ).astype(np.int64)
        split_of = (key * 2654435761 % 2**31) % n_splits
    else:
        split_of = np.zeros(m, dtype=np.int64)
    out_v, out_n, out_c = [], [], []
    EXC = np.int64(-(10 ** 7))  # below any real 6dp cosine ×1e6 (>= -1e6)
    for sp in range(n_splits):
        sel = np.where(split_of == sp)[0]
        msel = sel[mem[sel]]
        if len(sel) < 2 or len(msel) == 0:
            continue
        ids_q, Q = ids[sel], M[sel]
        ids_m, Mm = ids[msel], M[msel]
        n_m = len(msel)
        # dense ascending rank of member ids (stable: duplicate ids keep
        # input order, matching the old lexsort's behavior)
        id_rank = np.argsort(np.argsort(ids_m, kind="stable"), kind="stable")
        nq = np.sqrt((Q * Q).sum(axis=1))
        nm = np.sqrt((Mm * Mm).sum(axis=1))
        K = min(k, n_m)
        blk = max(1, (1 << 22) // n_m)
        for b0 in range(0, len(sel), blk):
            bsl = slice(b0, b0 + blk)
            S = np.round((Q[bsl] @ Mm.T) / (nq[bsl][:, None] * nm[None, :]), 6)
            s_int = np.rint(S * 1e6).astype(np.int64)
            s_int[ids_m[None, :] == ids_q[bsl][:, None]] = EXC  # self/dup-id
            keys = (-s_int) * np.int64(n_m) + id_rank[None, :]  # all distinct
            rows_i = np.arange(keys.shape[0])[:, None]
            if K < n_m:
                part = np.argpartition(keys, K - 1, axis=1)[:, :K]
                top = part[rows_i, np.argsort(keys[rows_i, part], axis=1)]
            else:
                top = np.argsort(keys, axis=1, kind="stable")
            valid = (s_int[rows_i, top] != EXC).ravel()
            out_v.append(np.repeat(ids_q[bsl], K)[valid])
            out_n.append(ids_m[top].ravel()[valid])
            out_c.append(S[rows_i, top].ravel()[valid])
    if not out_v:
        return pd.DataFrame({"vec_id": ids[:0], "neighbor_id": ids[:0],
                             "cosine": np.array([], dtype=np.float64)})
    return pd.DataFrame({"vec_id": np.concatenate(out_v),
                         "neighbor_id": np.concatenate(out_n),
                         "cosine": np.concatenate(out_c)})


def lsh_ann_topk(
    df: DataFrame,
    k: int = 5,
    n_bands: int = 8,
    bits_per_band: int = 4,
    dim: int = DIM,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded (AND/OR) hyperplane-LSH approximate top-k with 1-bit
    multi-probe. Output [vec_id, neighbor_id, cosine, rank] —
    approximate, fully deterministic.

    Construction: ``n_bands`` independent bands of ``bits_per_band``
    sign bits. A vector is INDEXED at its true key in each band and
    additionally PROBES every key at Hamming distance 1 (flip one of
    the band's bits), so two vectors are candidates iff some band's
    keys differ in <= 1 bit. Multi-probe raises the per-band collision
    probability from p^b to p^b + b·p^(b-1)(1-p), which let the band
    count drop 12 -> 8 while recall@1 rises past the 0.9 bar — near
    misses by one hyperplane sign are exactly the failures the plain
    banding had (recall@1 0.869 at r4; the true neighbor sits near a
    boundary plane for moderate cosines).

    Per (band, bucket) the exact cosine re-rank is ONE BLAS GEMM
    (visiting queries x indexed members) inside applyInPandas emitting
    <= k rows per visiting query; buckets over ``max_bucket`` rows are
    deterministically re-split first, bounding worst-case kernel cost
    at skewed buckets. The final merge dedups candidates across bands
    (max cosine) and ranks the survivors — a linear shuffle, never the
    all-pairs set.

    Scale: pair generation is O(sum of bucket_members · bucket_rows)
    bounded by max_bucket · n · (1 + bits); no driver collect; at
    100 TB the band keys would be written as bucketing columns so
    repeated queries skip the shuffle."""

    keys_udf = _band_keys_udf(n_bands, bits_per_band, dim)
    # index row (is_member=1, true key) + one probe row per 1-bit flip
    probe_expr = (
        "concat(array(named_struct('bkt', bkt0, 'is_member', 1)), "
        f"transform(sequence(0, {bits_per_band - 1}), "
        "j -> named_struct('bkt', cast(bkt0 ^ shiftleft(1, j) as int), "
        "'is_member', 0)))"
    )
    # ship the ORIGINAL float32 array through the probe-exploded
    # shuffle (half the bytes of a double cast); float32 -> float64 is
    # exact, so the in-kernel float64 GEMM sees identical values and
    # the SQL oracle (embedding::DOUBLE[]) stays bit-equal
    exploded = (
        df.select(F.col(id_col), F.col(vec_col).alias("v"))
        .dropna()
        .withColumn("__keys", keys_udf("v"))
        .select(id_col, "v", F.posexplode("__keys").alias("band", "bkt0"))
        .select(id_col, "v", "band", F.explode(F.expr(probe_expr)).alias("p"))
        .select(id_col, "v", "band", F.col("p.bkt").alias("bkt"),
                F.col("p.is_member").alias("is_member"))
    )

    id_dtype = dict(df.dtypes)[id_col]
    cand_schema = f"vec_id {id_dtype}, neighbor_id {id_dtype}, cosine double"

    # explicit repartition: exempt from AQE coalescing, so the Python
    # GEMM stage keeps full task parallelism (see kernel.py note); the
    # following groupBy reuses the distribution — still ONE shuffle
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    cands = (
        exploded.repartition(n_parts, "band", "bkt")
        .groupBy("band", "bkt")
        .applyInPandas(
            lambda key, pdf: _bucket_topk_kernel(pdf, id_col, k, max_bucket),
            schema=cand_schema,
        )
    )
    # dedup across bands, then rank the <= n_bands*k survivors per vector
    best = cands.groupBy("vec_id", "neighbor_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_bands: int = 12,
    bits_per_band: int = 4,
    dim: int = DIM,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine near-dup pairs via banded hyperplane LSH —
    the scale path behind cosine_dedup_pairs. Output
    [vec_id_1, vec_id_2, cosine], vec_id_1 < vec_id_2, deterministic.

    Candidates = vectors colliding in >= 1 of ``n_bands`` sign-bit
    bands; each bucket verifies exact cosine with one GEMM and emits
    only pairs >= threshold; a groupBy dedups pairs found by multiple
    bands. Shuffle volume is n_bands·n rows + surviving pairs — linear,
    never the n² pair set. Skewed buckets are deterministically
    re-split at ``max_bucket`` (same cap as lsh_ann_topk); near-dup
    pairs split apart by the re-split are a recall (not correctness)
    loss, matching the ANN contract."""
    import pandas as pd

    keys_udf = _band_keys_udf(n_bands, bits_per_band, dim)
    exploded = (
        df.select(F.col(id_col), _as_double(vec_col).alias("v"))
        .dropna()
        .withColumn("__keys", keys_udf("v"))
        .select(id_col, "v", F.posexplode("__keys").alias("band", "bkt"))
    )
    id_dtype = dict(df.dtypes)[id_col]
    pair_schema = f"vec_id_1 {id_dtype}, vec_id_2 {id_dtype}, cosine double"

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        empty = pd.DataFrame({"vec_id_1": ids[:0], "vec_id_2": ids[:0],
                              "cosine": np.array([], dtype=np.float64)})
        if m < 2:
            return empty
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        n_splits = -(-m // max_bucket)
        split_of = (ids.astype(np.int64) * 2654435761 % 2**31) % n_splits if n_splits > 1 \
            else np.zeros(m, dtype=np.int64)
        out1, out2, outc = [], [], []
        for sp in range(n_splits):
            sel = np.where(split_of == sp)[0]
            if len(sel) < 2:
                continue
            ids_s, Ms = ids[sel], M[sel]
            nrm = np.sqrt((Ms * Ms).sum(axis=1))
            S = np.round((Ms @ Ms.T) / (nrm[:, None] * nrm[None, :]), 6)
            iu, ju = np.triu_indices(len(sel), k=1)
            keep = (S[iu, ju] >= threshold) & (ids_s[iu] != ids_s[ju])
            iu, ju = iu[keep], ju[keep]
            lo = np.minimum(ids_s[iu], ids_s[ju])
            hi = np.maximum(ids_s[iu], ids_s[ju])
            out1.append(lo)
            out2.append(hi)
            outc.append(S[iu, ju])
        if not out1:
            return empty
        return pd.DataFrame({
            "vec_id_1": np.concatenate(out1),
            "vec_id_2": np.concatenate(out2),
            "cosine": np.concatenate(outc),
        })

    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    cands = (
        exploded.repartition(n_parts, "band", "bkt")
        .groupBy("band", "bkt")
        .applyInPandas(lambda key, pdf: bucket_pairs(pdf), schema=pair_schema)
    )
    return cands.groupBy("vec_id_1", "vec_id_2").agg(F.max("cosine").alias("cosine"))


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Back-compat shim for the round-1 flat-bucket signature: one band
    of ``n_planes`` bits through the banded path."""
    return lsh_ann_topk(df, k=k, n_bands=1, bits_per_band=n_planes, dim=dim,
                        id_col=id_col, vec_col=vec_col)


def lsh_ann_topk_oracle(k: int = 5, n_bands: int = 8, bits_per_band: int = 4,
                        dim: int = DIM) -> str:
    """The banded-LSH ANN is fully deterministic (md5 planes, float64
    GEMM, id tie-breaks), so it has an EXACT SQL oracle: per band a
    literal sign-projection key; 1-bit multi-probe means a query visits
    every member whose key is at Hamming distance <= 1, i.e. the band
    join condition is bit_count(xor(keys)) <= 1; per probed bucket a
    cosine top-k (partitioned by the MEMBER's bucket, matching the
    kernel's groupBy), cross-band max-cosine dedup, final rank. Assumes
    no bucket exceeds the re-split cap (true at oracle scale)."""
    band_selects = []
    for band in range(n_bands):
        bits = []
        for i in range(bits_per_band):
            plane = [_plane_value(band * bits_per_band + i, d) for d in range(dim)]
            dot = " + ".join(f"v[{d + 1}] * {plane[d]!r}" for d in range(dim))
            bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END)")
        band_selects.append(
            f"SELECT vec_id, v, nrm, {band} AS band, {' + '.join(bits)} AS bkt FROM v"
        )
    keys = "\nUNION ALL\n".join(band_selects)
    nrm = duck_norm("v", dim)
    dot_ab = duck_dot("a.v", "b.v", dim)
    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS v, {nrm} AS nrm
    FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
keys AS (
{keys}
),
pairs AS (
    SELECT a.band, b.bkt, a.vec_id, b.vec_id AS neighbor_id,
           round(({dot_ab}) / (a.nrm * b.nrm), 6) AS cosine
    FROM keys a JOIN keys b
      ON a.band = b.band AND bit_count(xor(a.bkt, b.bkt)) <= 1
         AND a.vec_id <> b.vec_id
),
bucket_topk AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY band, bkt, vec_id ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    ) WHERE rn <= {k}
),
best AS (
    SELECT vec_id, neighbor_id, MAX(cosine) AS cosine
    FROM bucket_topk GROUP BY 1, 2
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM best
) WHERE rank <= {k}
"""


def knn_label_vote(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = DIM,
) -> DataFrame:
    """k-NN majority label vote over exact cosine neighbors (the
    embedding-space analogue of the reference's knn_classify,
    polars_ts/classification/knn.py:13-165). Output
    [vec_id, label_pred, votes]; ties break toward the smaller label."""
    topk = brute_force_topk(df, k, id_col, vec_col, dim)
    labels = df.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nb_label"))
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("vec_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("votes").desc(), F.col("nb_label"))
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", F.col("nb_label").alias("label_pred"), "votes")
    )


def knn_label_vote_oracle(k: int = 5) -> str:
    nrm = duck_norm("v")
    dot = duck_dot("a.v", "b.v")
    return f"""
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v,
           {nrm} AS nrm
    FROM embeddings
),
scored AS (
    SELECT a.vec_id, b.vec_id AS neighbor_id, b.label AS nb_label,
           round(({dot}) / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
),
votes AS (
    SELECT vec_id, nb_label, COUNT(*) AS votes
    FROM ranked WHERE rank <= {k}
    GROUP BY 1, 2
)
SELECT vec_id, nb_label AS label_pred, votes
FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY votes DESC, nb_label) AS r FROM votes)
WHERE r = 1
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the k-means-bucketed scale path


# power-of-two quantizer: float32 * 2^20 only shifts the exponent, so the
# product is exact in double and FLOOR(x + 0.5) is a deterministic grid —
# cell sums become exact BIGINT arithmetic on both engines, which makes
# the Lloyd trajectory order-independent (a plain double SUM would vary
# with Spark partition order and could flip an argmin at a cell boundary)
_IVF_Q = 1048576.0


def _ivf_qexpr(vec_col: str) -> str:
    return (f"transform({vec_col}, x -> "
            f"cast(floor(cast(x as double) * {_IVF_Q} + 0.5) as bigint))")


def _ivf_assign_udf(cq: "np.ndarray", n_out: int):
    """Arrow UDF assigning each quantized vector to its ``n_out``
    nearest centroids by the exact-integer score A_j = |cq_j|² − 2⟨q,cq_j⟩
    (squared L2 minus the per-row constant |q|², so the ORDER over cells
    is the k-means assignment). Because centroids live on the same
    integer grid as the vectors, every product is ≤ 2^44 and every
    partial sum ≤ 2^52 (for |x| < 4; real embeddings are unit-scale) —
    float64 BLAS GEMM computes A exactly and
    ORDER-INDEPENDENTLY, so this vectorized path is bitwise-equal to the
    oracle's BIGINT arithmetic with no summation-order caveats. Ties
    break to the smaller cell id (stable argsort)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    CQ = cq.astype(np.float64)  # exact: grid ints < 2^53
    norm2 = (CQ * CQ).sum(axis=1)

    def _assign(qs):
        Q = np.vstack([np.asarray(q, dtype=np.float64) for q in qs])
        A = norm2[None, :] - 2.0 * (Q @ CQ.T)
        if n_out == 1:
            # np.argmin returns the FIRST minimum — the smaller cell id
            return pd.Series(A.argmin(axis=1).astype(np.int32))
        order = np.argsort(A, axis=1, kind="stable")[:, :n_out].astype(np.int32)
        return pd.Series(list(order))

    return pandas_udf(_assign, "int" if n_out == 1 else "array<int>")


def ivf_ann_topk(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 12,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
    max_cell: int = 32768,
    train_cap: int = 65536,
    warn_oversize: bool = False,
) -> DataFrame:
    """IVF-flat approximate top-k cosine neighbors: a coarse k-means
    quantizer partitions the corpus into ``n_cells`` inverted lists;
    each query scans only its ``n_probe`` nearest cells. Output
    [vec_id, neighbor_id, cosine, rank] like brute_force_topk.

    Deterministic end to end: md5-rank seeds, ``n_iter`` fixed Lloyd
    iterations with BOTH vectors and centroids on the exact-integer
    quantization grid (see ``_IVF_Q``) — every assignment score is an
    exact integer < 2^53, so float64 GEMM (Spark) and BIGINT arithmetic
    (DuckDB) agree bitwise with NO summation-order caveats; argmin/probe
    ties break on cell id, cosines round to 6 decimals BEFORE ranking,
    rank ties on neighbor_id. The whole trajectory replays in SQL
    (``ivf_ann_oracle``).

    Scale: centroids are driver-tiny (n_cells × dim) at every step —
    the corpus itself is never collected; assignment is a vectorized
    Arrow-batched GEMM against the broadcast centroid matrix (no
    shuffle), each Lloyd update is one map-side-combinable aggregate of
    exact BIGINT sums, and the search shuffles n_probe rows per vector
    into a per-cell blocked BLAS GEMM (shared with lsh_ann_topk) —
    linear, never n². Grow n_cells ~ sqrt(n) so inverted lists stay
    bounded; ``max_cell`` is the OOM backstop (deterministic re-split,
    recall loss per the ANN contract — at scale raise n_cells instead).
    Training reads only the md5-rank-first ``train_cap`` rows
    (quantizer quality needs ~10^3 points/cell, not the corpus), so
    quantizer cost is constant in corpus size.
    Exactness bounds: grid products ≤ 2^44 for |x| < 4, so 64-dim score
    sums stay < 2^52 (proven as a hypothesis property); the Lloyd
    BIGINT sums hold to ~10^9 rows/cell."""
    from pyspark.sql import Window

    spark = df.sparkSession
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"vec_id {id_dtype}, neighbor_id {id_dtype}, cosine double, rank int"
    base = (
        df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
        .dropna()
        .withColumn("__q", F.expr(_ivf_qexpr("__v")))
    )
    from polars_ts_spark.operators.textops import spark_hash60

    # centroid training runs on a BOUNDED deterministic sample — the
    # md5-rank-first ``train_cap`` rows (the same ordering the seeds
    # use, so the oracle replays it with one ROW_NUMBER). Quantizer
    # quality needs ~10^3 points per cell, not the corpus; training on
    # (and persisting!) the full table would thrash at 100 TB, while
    # orderBy+limit plans as TakeOrderedAndProject — per-partition
    # top-K + a driver merge of K-row heads, no full sort. The sample
    # (<= train_cap rows) is what gets cached for the n_iter passes;
    # the cache is dropped before the (lazy) search plan is built.
    cached = (
        base.select(id_col, "__q")
        .orderBy(F.expr(spark_hash60(f"cast({id_col} as string)")), F.col(id_col))
        .limit(train_cap)
        .persist()
    )
    try:
        # re-sort the (tiny) persisted sample: a bare .limit() after
        # persist gives arbitrary rows, not the hash-rank head
        seeds = (
            cached.orderBy(
                F.expr(spark_hash60(f"cast({id_col} as string)")), F.col(id_col)
            ).limit(n_cells).collect()
        )
        if not seeds:
            return spark.createDataFrame([], schema=schema)
        cq = np.array([r["__q"] for r in seeds], dtype=np.int64)

        for _ in range(n_iter):
            sums = (
                cached.withColumn("__cell", _ivf_assign_udf(cq, 1)("__q"))
                .groupBy("__cell")
                .agg(
                    F.count(F.lit(1)).alias("__n"),
                    *[F.sum(F.expr(f"__q[{i}]")).alias(f"__s{i}") for i in range(dim)],
                )
                .collect()
            )
            for r in sums:  # empty cells keep their previous centroid
                # floor(s/n + 0.5): re-quantize the mean onto the grid —
                # the identical IEEE divide/add/floor sequence as the
                # oracle's FLOOR(CAST(s AS DOUBLE)/CAST(n AS DOUBLE)+0.5)
                cq[r["__cell"]] = [
                    int(np.floor(float(r[f"__s{i}"]) / float(r["__n"]) + 0.5))
                    for i in range(dim)
                ]
    finally:
        cached.unpersist()

    # search: explode every vector into its n_probe cells (probe 0 = the
    # home cell where it is INDEXED; the others it only visits), then one
    # blocked float64 GEMM per cell — the lsh_ann_topk kernel. A plain
    # cell-id equi-join evaluating a 64-term expanded dot per candidate
    # row was ~30x slower: Catalyst can't JIT an expression that large,
    # so 15M+ candidate rows ran interpreted; the GEMM does the same
    # flops in BLAS. Shuffle volume is n_probe rows per vector.
    exploded = (
        base.withColumn("__probes", _ivf_assign_udf(cq, n_probe)("__q"))
        .select(
            F.col(id_col), F.col("__v").alias("v"),
            F.posexplode("__probes").alias("__pos", "__cell"),
        )
        .withColumn("is_member", (F.col("__pos") == 0).cast("int"))
    )
    if warn_oversize:
        # oversized cells re-split deterministically inside the kernel
        # (recall loss per the ANN contract) while a whole-cell oracle
        # scans them intact — surface the parity break instead of
        # diverging silently. Opt-in: it costs one counting pass.
        import warnings

        over = (
            exploded.groupBy("__cell").count()
            .filter(F.col("count") > max_cell).collect()
        )
        if over:
            cells = sorted(int(r["__cell"]) for r in over)
            warnings.warn(
                f"ivf_ann_topk: cell(s) {cells} exceed max_cell={max_cell} and "
                "will be re-split (deterministic recall loss vs a whole-cell "
                "scan); raise n_cells (~sqrt(n)) or max_cell",
                RuntimeWarning,
                stacklevel=2,
            )
    cand_schema = f"vec_id {id_dtype}, neighbor_id {id_dtype}, cosine double"
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cands = (
        exploded.repartition(min(n_parts, n_cells), "__cell")
        .groupBy("__cell")
        .applyInPandas(
            lambda key, pdf: _bucket_topk_kernel(pdf, id_col, k, max_cell),
            schema=cand_schema,
        )
    )
    # a member has exactly one home cell, so (vec_id, neighbor_id) is
    # unique across cells — the max() only matters under a re-split
    best = cands.groupBy("vec_id", "neighbor_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return best.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_ann_oracle(
    k: int = 5, n_cells: int = 16, n_probe: int = 12, n_iter: int = 2,
    dim: int = DIM, train_cap: int = 65536,
) -> str:
    """Full SQL replay of ``ivf_ann_topk`` — md5-rank seeds, the exact
    Lloyd trajectory (trained on the md5-rank-first ``train_cap``
    sample) with centroids re-quantized onto the integer grid
    every update, probe selection and ranked cell-scan — as chained
    (materialized) CTEs. Assignment scores are pure BIGINT arithmetic
    (exact, order-independent), matching Spark's float64 GEMM on the
    same grid integers bit for bit."""
    from polars_ts_spark.operators.textops import duck_hash60

    def dist(qref: str, cref: str) -> str:
        # |cq|^2 - 2<q,cq> over grid BIGINTs: exact integers, so ANY
        # summation order (here a chain; numpy GEMM on the Spark side)
        # yields the identical value
        norm2 = " + ".join(f"{cref}[{i + 1}] * {cref}[{i + 1}]" for i in range(dim))
        dot = " + ".join(f"{qref}[{i + 1}] * {cref}[{i + 1}]" for i in range(dim))
        return f"({norm2}) - 2 * ({dot})"

    sums_cols = ", ".join(f"SUM(q[{i + 1}]) AS s{i}" for i in range(dim))
    cent_list = ", ".join(
        f"CAST(FLOOR(CAST(g.s{i} AS DOUBLE) / CAST(g.n AS DOUBLE) + 0.5) AS BIGINT)"
        for i in range(dim)
    )
    parts = [f"""
qv AS MATERIALIZED (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_IVF_Q} + 0.5) AS BIGINT)) AS q,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE embedding IS NOT NULL
),
samp AS MATERIALIZED (
    SELECT vec_id, q,
           ROW_NUMBER() OVER (
               ORDER BY {duck_hash60("CAST(vec_id AS VARCHAR)")}, vec_id
           ) - 1 AS rnk
    FROM qv
    QUALIFY rnk < {train_cap}
),
c0 AS MATERIALIZED (
    SELECT rnk AS cell, q AS cq
    FROM samp
    WHERE rnk < {n_cells}
)"""]
    prev = "c0"
    for it in range(n_iter):
        parts.append(f""",
asg{it} AS MATERIALIZED (
    SELECT vec_id, cell FROM (
        SELECT q.vec_id, c.cell,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {dist("q.q", "c.cq")}, c.cell) AS pr
        FROM samp q CROSS JOIN {prev} c
    ) WHERE pr = 1
),
g{it} AS MATERIALIZED (
    SELECT a.cell, COUNT(*) AS n, {sums_cols}
    FROM asg{it} a JOIN samp USING (vec_id)
    GROUP BY a.cell
),
c{it + 1} AS MATERIALIZED (
    SELECT p.cell,
           CASE WHEN g.cell IS NULL THEN p.cq ELSE [{cent_list}] END AS cq
    FROM {prev} p LEFT JOIN g{it} g ON g.cell = p.cell
)""")
        prev = f"c{it + 1}"
    parts.append(f""",
fin AS MATERIALIZED (
    SELECT q.vec_id, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {dist("q.q", "c.cq")}, c.cell) AS pr
    FROM qv q CROSS JOIN {prev} c
),
scored AS (
    SELECT p.vec_id, h.vec_id AS neighbor_id,
           ({duck_dot("a.v", "b.v", dim)}) / ({duck_norm("a.v", dim)} * {duck_norm("b.v", dim)}) AS cos
    FROM (SELECT vec_id, cell FROM fin WHERE pr <= {n_probe}) p
    JOIN (SELECT vec_id, cell FROM fin WHERE pr = 1) h
      ON h.cell = p.cell AND h.vec_id <> p.vec_id
    JOIN qv a ON a.vec_id = p.vec_id
    JOIN qv b ON b.vec_id = h.vec_id
)
SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM (
    SELECT vec_id, neighbor_id, ROUND(cos, 6) AS cosine, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY ROUND(cos, 6) DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= {k}""")
    return "WITH " + "".join(parts).lstrip()
