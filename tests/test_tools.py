"""Regression tests for the round tooling itself — the judge reads the
artifacts these tools write (`CORRECTNESS_LOCAL.json`,
`BENCH_LOCAL.json`), so their provenance/merge logic is part of the
evidence chain and gets the same test treatment as operators.

- merge_correctness note stamping: VERDICT r11 "what's wrong" #1 — the
  r11 merge carried the r10 note verbatim, misstating which entries
  were fresh. Every merge must rewrite the note.
- bench composite accumulation: VERDICT r11 next-round #1 — per-query
  clean-bracket minima accumulated across attempts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_when_quiet import (  # noqa: E402
    build_composite,
    is_clean,
    merge_attempt,
)
from tools.merge_correctness import infer_round, stamp_note  # noqa: E402


def test_stamp_note_rewrites_round_and_names():
    snap = {"note": "round-10 merged snapshot ... stale text",
            "results": {}}
    stamp_note(snap, ["q_b", "q_a"], rnd=12, date="2026-08-16")
    note = snap["note"]
    assert "round-12 merged snapshot (2026-08-16)" in note
    assert "re-ran 2 queries" in note
    assert "q_a, q_b" in note            # sorted name list
    assert "round-10" not in note        # the stale text is GONE
    # singular form
    stamp_note(snap, ["solo"], rnd=13, date="2026-08-17")
    assert "re-ran 1 query at sf0.01" in snap["note"]


def test_infer_round_from_driver_artifacts(tmp_path):
    assert infer_round(str(tmp_path)) == 1
    for n in (1, 7, 11):
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text("{}")
    assert infer_round(str(tmp_path)) == 12
    # the repo itself: must be the round after the latest driver record
    repo_round = infer_round()
    recorded = [int(p.split("_r")[1].split(".")[0])
                for p in os.listdir(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
                if p.startswith("CORRECTNESS_r") and p.endswith(".json")]
    assert repo_round == max(recorded) + 1


def _rec(queries, hot=(), bw_dirty=()):
    return {"queries": queries, "hot_queries": list(hot),
            "bw_dirty_queries": list(bw_dirty),
            "probe_trail_sec": {n: [0.2] for n in queries},
            "bw_trail_sec": {n: [0.1] for n in queries},
            "sf": 0.1, "quality": {}, "cold_queries": {}}


def test_bench_composite_clean_beats_dirty_and_min_among_clean():
    comp = {}
    rec0 = _rec({"q1": 2.0, "q2": 5.0, "q3": 3.0},
                hot=["q2"], bw_dirty=["q2", "q3"])
    assert is_clean("q1", rec0) and not is_clean("q2", rec0)
    merge_attempt(comp, rec0, 0)
    # clean replaces dirty even when SLOWER (6.0 > 5.0)
    merge_attempt(comp, _rec({"q2": 6.0, "q3": 2.5}), 1)
    assert comp["q2"] == {**comp["q2"], "value": 6.0, "attempt": 1,
                          "clean": True}
    # among clean samples, the minimum wins
    merge_attempt(comp, _rec({"q2": 4.5}), 2)
    assert comp["q2"]["value"] == 4.5 and comp["q2"]["attempt"] == 2
    # a dirty sample can never displace a clean one
    merge_attempt(comp, _rec({"q2": 0.5}, hot=["q2"]), 3)
    assert comp["q2"]["value"] == 4.5
    out = build_composite(comp, rec0, attempt_totals=[{"attempt": 0}])
    assert out["mode"] == "composite"
    assert out["value"] == 2.0 + 4.5 + 2.5
    assert out["hot_queries"] == [] and out["bw_dirty_queries"] == []
    assert out["query_provenance"]["q2"] == {"attempt": 2, "clean": True}


def test_bench_composite_flags_never_clean_queries():
    comp = {}
    rec = _rec({"q1": 2.0, "q2": 5.0, "q3": 3.0},
               hot=["q2"], bw_dirty=["q2", "q3"])
    merge_attempt(comp, rec, 0)
    # a dirty-but-faster re-sample still updates the kept minimum
    merge_attempt(comp, _rec({"q2": 4.0}, hot=["q2"], bw_dirty=["q2"]), 1)
    out = build_composite(comp, rec, attempt_totals=[])
    assert out["hot_queries"] == ["q2"]
    assert out["bw_dirty_queries"] == ["q2", "q3"]
    assert out["queries"]["q2"] == 4.0
    assert out["query_provenance"]["q2"] == {"attempt": 1, "clean": False}


def test_bench_composite_shared_subset_vs_committed_records():
    """The composite must carry shared-subset totals vs the committed
    r8/r10/r11 records so cross-round drift reads straight from the
    file (VERDICT r11 #1 'Done =' clause)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = json.load(open(os.path.join(repo, "tools", "bench_history.json")))
    r11 = hist["r11"]["queries"]
    comp = {}
    merge_attempt(comp, _rec({n: 1.0 for n in list(r11)[:5]}), 0)
    out = build_composite(comp, _rec({}), attempt_totals=[])
    ss = out["shared_subset"]["vs_r11"]
    assert ss["n_queries"] == 5
    assert ss["composite_total"] == 5.0
    assert ss["ratio"] > 0
    assert ss["their_commit"] == hist["r11"]["source_commit"]
