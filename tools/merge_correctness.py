"""Round-scoped refresh of CORRECTNESS_LOCAL.json (the sf0.01
snapshot): re-run ONLY the named queries at sf0.01 and merge their
fresh outcomes into the existing snapshot — the r10 convention for
rounds that touch a subset (the full sf0.01 sweep costs >1 h because
kasba's recursive-CTE oracle alone takes ~39 min; the untouched
entries' code paths are byte-identical so their recorded outcomes
remain valid evidence).

Every merge REWRITES the snapshot's ``note`` field with the round
number, date, and re-run name list (VERDICT r11 wrong #1 / ADVICE
r11: the r11 merge carried the r10 note verbatim, so the committed
evidence file misstated which entries were fresh — the note must
describe the merge that actually produced the file).

Usage: python tools/merge_correctness.py name1 name2 ...
       [--round N]  (default: inferred as 1 + max CORRECTNESS_r*.json)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, normalize  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
SF_DIR = "/root/testdata/sf0.01"


def infer_round(repo: str = REPO) -> int:
    """Current build round = 1 + the highest driver-recorded round."""
    rounds = [int(m.group(1)) for p in glob.glob(
        os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def stamp_note(snap: dict, names: list[str], rnd: int,
               date: str | None = None) -> None:
    """Rewrite the snapshot's provenance note so the file itself states
    which entries the merge refreshed and why the rest remain valid."""
    date = date or time.strftime("%Y-%m-%d")
    snap["note"] = (
        f"round-{rnd} merged snapshot ({date}): re-ran "
        f"{len(names)} quer{'y' if len(names) == 1 else 'ies'} at sf0.01 "
        f"via tools/merge_correctness.py — {', '.join(sorted(names))}. "
        f"All other entries are carried from the prior snapshot: their "
        f"code paths were untouched this round, so their recorded "
        f"outcomes remain valid evidence.")


def main():
    args = sys.argv[1:]
    rnd = None
    if "--round" in args:
        i = args.index("--round")
        rnd = int(args[i + 1])
        del args[i:i + 2]
    names = args
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
    stamp_note(snap, names, rnd if rnd is not None else infer_round())
    with open(OUT, "w") as f:
        json.dump(snap, f, indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail — merged into {OUT} "
          f"({len(snap['results'])} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
