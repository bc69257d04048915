"""Dump `.explain("formatted")` for every headline bench query.

Usage: python tools/explain_all.py <suffix> [query,query,...]

Writes plans/r12/<query>_<suffix>.txt for each headline query (default:
all of bench.HEADLINE). Plans are produced without executing the query,
so this is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from bench import HEADLINE  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("polars-ts-spark-explain")
    qs = queries()
    names = [n for n in HEADLINE if n in qs and (only is None or n in only)]
    import contextlib
    import io

    for name in names:
        buf = io.StringIO()
        try:
            df = qs[name](spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(name, "done", flush=True)


if __name__ == "__main__":
    main()
