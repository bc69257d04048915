"""Deterministic 100x-documents corpus for the scaling probe (VERDICT
r9 #5): the shipped testdata grows `documents` only 10x across sfs
(500 -> 500 -> 5k), so the curation rows in COVERAGE.md had no
100x-docs column. This generator mirrors the driver corpus' shape —
the SAME fixed 30-token vocabulary (plus the rare 'dup' marker),
uniform 10-99 token lengths, ~0.17% exact duplicates, the same
lang/source label distribution — at 50,000 docs (100x sf0.01), so the
probe isolates CORPUS GROWTH while the vocabulary stays fixed. That
is exactly the regime the ngram_lm_score saturation claim is about:
its LM count tables grow with the distinct-gram vocabulary, which is
bounded (<= 31 + 31^2 grams) regardless of corpus size.

Output: $SPARK_GRAFT_SCALE100_DIR/documents.parquet (default
/root/repo/tmp_scale100/). Off-registry by design — the correctness
gate never reads it.

Usage: python tools/make_scale_corpus.py [n_docs]
"""

from __future__ import annotations

import os
import random
import sys

import pandas as pd

# the driver corpus' exact 30-token vocabulary (observed at every sf;
# 'dup' appears as a rare 31st marker token)
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "es", "fr", "de", "zh"]
LANG_W = [41, 15, 15, 14, 15]  # the shipped corpus' label mix


def make(n_docs: int = 50_000, seed: int = 100) -> pd.DataFrame:
    rng = random.Random(seed)
    texts: list[str] = []
    rows = []
    for d in range(n_docs):
        if d % 600 == 599 and texts:  # ~0.17% exact duplicates
            text = texts[rng.randrange(len(texts))]
        else:
            n = rng.randint(10, 99)
            toks = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n)]
            if rng.random() < 0.05:
                toks[rng.randrange(n)] = "dup"
            text = " ".join(toks)
        texts.append(text)
        rows.append((d, text, rng.choices(LANGS, weights=LANG_W)[0],
                     f"src{rng.randrange(20)}", len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_dir = os.environ.get(
        "SPARK_GRAFT_SCALE100_DIR", "/root/repo/tmp_scale100")
    os.makedirs(out_dir, exist_ok=True)
    df = make(n)
    path = os.path.join(out_dir, "documents.parquet")
    df.to_parquet(path, index=False)
    print(f"{path}: {len(df)} docs, "
          f"{df['text'].str.split(' ').str.len().mean():.1f} avg tokens, "
          f"{len(df) - df['text'].nunique()} exact dups")


if __name__ == "__main__":
    main()
