"""Unit tests for tools/bench_compare.py (r13 brief #5): the r13
continuity properties — streaming replay entries normalize by
``cal_stream`` EXCLUSIVELY when both rounds carry it, and the STALE
advisory fires on a genuine "box sped up, entry stayed flat" case
instead of manufacturing a REGRESSION flag (the r11 artifact)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_compare import compare, load_bench  # noqa: E402


def _payload(queries, cal=1.0, cal_py=1.0, cal_stream=None, total=None):
    d = {"metric": "bench_total_sec",
         "value": total if total is not None else sum(queries.values()),
         "unit": "sec", "queries": dict(queries), "sf": 0.1,
         "cal": cal, "cal_py": cal_py}
    if cal_stream is not None:
        d["cal_stream"] = cal_stream
    return d


def _entry(rep, name):
    return next(e for e in rep["entries"] if e["entry"] == name)


def test_replay_entries_normalize_by_cal_stream_exclusively():
    """A streaming replay entry that drifted exactly with cal_stream
    (trigger-loop drift) must NOT be flagged even when the CPU cals
    stayed flat — and a CPU entry with the same raw drift IS flagged
    (cal_stream must not leak into non-replay entries)."""
    prev = _payload({"streaming_cep_replay": 2.0, "join_inner": 2.0},
                    cal=1.0, cal_py=1.0, cal_stream=4.0)
    cur = _payload({"streaming_cep_replay": 3.0, "join_inner": 3.0},
                   cal=1.0, cal_py=1.0, cal_stream=6.0)
    rep = compare(prev, cur, threshold=1.25)
    replay = _entry(rep, "streaming_cep_replay")
    assert replay["flagged"] is False
    assert replay["explained_by"] == "cal_stream"
    assert abs(replay["normalized"] - 1.0) < 1e-9
    cpu = _entry(rep, "join_inner")
    assert cpu["flagged"] is True        # 1.5x raw, no cal explains it
    assert cpu["explained_by"] != "cal_stream"


def test_replay_falls_back_to_cpu_cals_without_cal_stream_on_both():
    """Only ONE side carrying cal_stream (e.g. comparing against a
    pre-r12 round) falls back to the CPU calibrations for replay
    entries rather than silently skipping normalization."""
    prev = _payload({"streaming_cep_replay": 2.0})  # no cal_stream
    cur = _payload({"streaming_cep_replay": 3.0}, cal=1.5,
                   cal_stream=6.0)
    rep = compare(prev, cur, threshold=1.25)
    replay = _entry(rep, "streaming_cep_replay")
    assert replay["explained_by"] == "cal"       # CPU cal explains 1.5x
    assert replay["flagged"] is False


def test_stale_advisory_on_box_speedup_with_flat_entry():
    """Box sped up 40% (all cals sub-1) while the entry stayed flat:
    the clamped normalizer must NOT flag a regression, and the STALE
    advisory must fire — the entry failed to ride the speedup."""
    prev = _payload({"agg_tpch_q1": 2.0}, cal=1.0, cal_py=1.0)
    cur = _payload({"agg_tpch_q1": 2.0}, cal=1.0 / 1.4, cal_py=1.0 / 1.4)
    rep = compare(prev, cur, threshold=1.25)
    e = _entry(rep, "agg_tpch_q1")
    assert e["flagged"] is False, "clamp must kill the sub-1-divisor flag"
    assert e["status"] == "stale"
    assert abs(e["ratio"] - 1.0) < 1e-9


def test_stale_does_not_fire_when_entry_rides_the_speedup():
    prev = _payload({"agg_tpch_q1": 2.0}, cal=1.0, cal_py=1.0)
    cur = _payload({"agg_tpch_q1": 1.45}, cal=1.0 / 1.4, cal_py=1.0 / 1.4)
    rep = compare(prev, cur, threshold=1.25)
    e = _entry(rep, "agg_tpch_q1")
    assert e["flagged"] is False
    assert e["status"] == "ok"


def test_broke_and_recovered_sentinels():
    prev = _payload({"a": 1.0, "b": -1.0})
    cur = _payload({"a": -1.0, "b": 1.0})
    rep = compare(prev, cur)
    assert _entry(rep, "a")["status"] == "broke"
    assert _entry(rep, "a")["flagged"] is True
    assert _entry(rep, "b")["status"] == "recovered"
    assert _entry(rep, "b")["flagged"] is False


def test_load_bench_prefers_parsed_wrapper_and_raw_tail(tmp_path):
    import json
    w = tmp_path / "BENCH_r98.json"
    w.write_text(json.dumps(
        {"round": 98, "parsed": _payload({"a": 1.0})}))
    assert load_bench(str(w))["queries"] == {"a": 1.0}
    raw = tmp_path / "raw.txt"
    raw.write_text("noise\n" + json.dumps(_payload({"b": 2.0})) + "\n")
    assert load_bench(str(raw))["queries"] == {"b": 2.0}
