"""Round-scoped refresh of CORRECTNESS_LOCAL.json (the sf0.01
snapshot): re-run ONLY the named queries at sf0.01 and merge their
fresh outcomes into the existing snapshot — the r10 convention for
rounds that touch a subset (the full sf0.01 sweep costs >1 h because
kasba's recursive-CTE oracle alone takes ~39 min; the untouched
entries' code paths are byte-identical so their recorded outcomes
remain valid evidence).

Usage: python tools/merge_correctness.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, normalize  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
SF_DIR = "/root/testdata/sf0.01"


def main():
    names = sys.argv[1:]
    assert names, "pass query names"
    snap = json.load(open(OUT))
    assert snap["sf_dir"] == SF_DIR
    spark = get_spark("correctness-merge")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, os_ = queries(), oracle_sql()
    n_pass = n_fail = 0
    for name in names:
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = con.execute(os_[name]).df()
        a, b = normalize(sdf), normalize(odf)
        ok = (len(a) == len(b) and list(a.columns) == list(b.columns)
              and a.equals(b))
        snap["results"][name] = {
            "rows_match": len(a) == len(b),
            "schema_match": list(a.columns) == list(b.columns),
            "hash_match": bool(ok),
            "spark_rows": len(a), "oracle_rows": len(b), "err": None}
        print(("pass" if ok else "FAIL") + f"  {name} ({len(a)} rows)")
        n_pass += ok
        n_fail += not ok
    with open(OUT, "w") as f:
        json.dump(snap, f, indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail — merged into {OUT} "
          f"({len(snap['results'])} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
