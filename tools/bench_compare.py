"""Cross-round bench comparison, normalized by the machine-state
calibration constants (r11 brief #4).

bench.py emits two fixed-work calibration timings per run — ``cal``
(Catalyst hash-agg, JVM/codegen path) and ``cal_py`` (Arrow
mapInPandas identity, Python worker path).  Unchanged catalog entries
have drifted a uniform ~1.2× round-to-round on byte-identical code
(documented machine-state class, BASELINE.md §C r8-r10), so a raw
cross-round ratio cannot distinguish a real regression from a slower
box.  This tool divides each entry's ratio by the calibration ratios
and flags only entries whose NORMALIZED ratio exceeds the threshold:

    normalized = (cur_entry / prev_entry) / max-explaining-cal-ratio

where the explaining ratio is whichever calibration (JVM or Python)
better accounts for the drift — i.e. we take min over both, which is
deliberately conservative: an entry is flagged only when NEITHER
execution path's machine-state drift explains its slowdown.

r12 additions: ``cal_stream`` (a fixed-work multi-trigger streaming
job) normalizes the ``streaming_*_replay`` entries exclusively — they
are micro-batch-scheduling-bound, and a CPU constant was the wrong
normalizer for them.  Explaining ratios are clamped at >= 1.0 in every
branch (a sub-1 divisor manufactured REGRESSION flags out of flat
entries when the box sped up); the genuine signal there is reported as
a separate ``stale`` advisory status instead.

Usage:
    python3 tools/bench_compare.py PREV.json [CUR.json] [--threshold 1.25]

Accepts either the driver's BENCH_r{N}.json wrapper (with a
``parsed`` field) or a raw bench.py stdout JSON line in a file.  With
no CUR argument, reads the current bench line from stdin (pipe
``python3 bench.py | python3 tools/bench_compare.py BENCH_r10.json``).
bench.py also calls :func:`emit_comparison` itself after each run,
against the newest BENCH_r*.json present, so a plain bench run prints
the normalized table on stderr with zero extra steps.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def load_bench(src) -> dict:
    """A BENCH payload from a driver wrapper file, a raw stdout-line
    file, or an already-parsed dict."""
    if isinstance(src, dict):
        d = src
    else:
        with open(src) as f:
            text = f.read().strip()
        # the driver wrapper is JSON with a "parsed" field; a raw
        # bench stdout capture may hold several lines — take the last
        # JSON object line with a "queries" key
        try:
            d = json.loads(text)
        except json.JSONDecodeError:
            d = None
            for line in reversed(text.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "queries" in cand:
                        d = cand
                        break
            if d is None:
                raise ValueError(f"no bench JSON found in {src}")
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise ValueError("bench payload has no 'queries' field")
    return d


def compare(prev: dict, cur: dict, threshold: float = 1.25) -> dict:
    """Per-entry raw and normalized ratios; flagged = normalized ratio
    above ``threshold`` (a regression no calibration explains)."""
    pq, cq = prev["queries"], cur["queries"]
    cals = []
    for key in ("cal", "cal_py"):
        a, b = prev.get(key), cur.get(key)
        if a and b:
            cals.append((key, b / a))
    # trigger-loop constant (r12): the streaming replay entries are
    # micro-batch-scheduling-bound, not CPU-bound — when both rounds
    # carry cal_stream, those entries normalize by it EXCLUSIVELY (a
    # CPU constant was the wrong normalizer, the recurring r10/r11
    # watch-item ambiguity)
    stream_cals = None
    a, b = prev.get("cal_stream"), cur.get("cal_stream")
    if a and b:
        stream_cals = [("cal_stream", b / a)]
    entries = []
    for name, cv in cq.items():
        pv = pq.get(name)
        # bench.py records -1.0 for an entry whose query RAISED — the
        # worst regression there is, never a ratio (review find r11)
        if cv is not None and cv < 0:
            entries.append({"entry": name, "status": "broke",
                            "prev": pv, "cur": cv,
                            "flagged": pv is not None and pv > 0})
            continue
        if pv is not None and pv < 0:
            entries.append({"entry": name, "status": "recovered",
                            "prev": pv, "cur": cv, "flagged": False})
            continue
        if not pv:
            entries.append({"entry": name, "status": "new",
                            "cur": cv})
            continue
        ratio = cv / pv
        ecals = (stream_cals if stream_cals is not None
                 and name.startswith("streaming_")
                 and name.endswith("_replay") else cals)
        # min over the calibrations: flag only what NO path's machine
        # drift explains.  Explaining ratios are clamped at >= 1.0 in
        # EVERY branch — dividing by a sub-1 ratio (box got faster)
        # manufactures regressions out of flat entries (5 of the
        # driver's 16 r11 flags were exactly this artifact at raw
        # ratios 0.96-1.00, judge's What's-wrong #1).  The real signal
        # hiding there — "box sped up, entry stayed flat" — is kept as
        # a separate STALE advisory, computed from the unclamped ratio.
        norms = {k: ratio / max(r, 1.0) for k, r in ecals} \
            or {"raw": ratio}
        key, norm = min(norms.items(), key=lambda kv: abs(kv[1] - 1.0))
        flagged = norm > threshold
        stale = (not flagged and bool(ecals)
                 and min(ratio / r for _, r in ecals) > threshold)
        entries.append({
            "entry": name, "status": "stale" if stale else "ok",
            "prev": pv, "cur": cv,
            "ratio": round(ratio, 3), "normalized": round(norm, 3),
            "explained_by": key if key != "raw" else None,
            "flagged": flagged,
        })
    gone = [n for n in pq if n not in cq]
    return {
        "threshold": threshold,
        "calibration_ratios": {k: round(r, 3) for k, r in cals},
        "total_ratio": (round(cur.get("value", 0) /
                              prev.get("value", 1), 3)
                        if prev.get("value") else None),
        "entries": entries,
        "removed": gone,
        "flagged": sorted(
            (e["entry"] for e in entries if e.get("flagged")),
            key=lambda n: -next(
                x.get("normalized", float("inf")) for x in entries
                if x["entry"] == n)),
    }


def emit_comparison(cur: dict, prev_path: str | None = None,
                    threshold: float = 1.25, out=sys.stderr) -> None:
    """Print the normalized comparison table (called by bench.py after
    each run).  ``prev_path`` defaults to the newest BENCH_r*.json in
    the repo root; silently a no-op when none exists or the previous
    round carries no calibration constants."""
    if prev_path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = sorted(
            glob.glob(os.path.join(root, "BENCH_r*.json")),
            key=lambda p: -int(re.search(r"BENCH_r(\d+)", p).group(1)))
        # newest PARSEABLE round: a driver wrapper can carry
        # parsed=null when the run's tail buffer lost the payload line
        # (BENCH_r11.json) — fall back to the next round rather than
        # silently skipping the comparison
        prev = None
        for cand in cands:
            try:
                prev = load_bench(cand)
                prev_path = cand
                break
            except (OSError, ValueError):
                continue
        if prev is None:
            return
    else:
        try:
            prev = load_bench(prev_path)
        except (OSError, ValueError):
            return
    if not (prev.get("cal") and cur.get("cal")):
        print(f"bench_compare: {os.path.basename(prev_path)} has no "
              "calibration constants — raw ratios only", file=out)
    if prev.get("sf") != cur.get("sf"):
        print(f"bench_compare: SCALE MISMATCH (prev sf={prev.get('sf')}"
              f", cur sf={cur.get('sf')}) — ratios are not "
              "round-over-round comparable", file=out)
    rep = compare(prev, cur, threshold)
    print(f"bench_compare vs {os.path.basename(prev_path)}: "
          f"total ratio {rep['total_ratio']}, "
          f"cal ratios {rep['calibration_ratios']}", file=out)
    for e in rep["entries"]:
        if e["status"] == "broke" and e.get("flagged"):
            print(f"  BROKE {e['entry']}: {e['prev']:.3f}s -> entry "
                  "now RAISES (-1.0 sentinel)", file=out)
    worst = sorted((e for e in rep["entries"]
                    if e["status"] in ("ok", "stale")),
                   key=lambda e: -e["normalized"])
    for e in worst:
        if e["flagged"]:
            print(f"  REGRESSION {e['entry']}: {e['prev']:.3f}s -> "
                  f"{e['cur']:.3f}s (raw {e['ratio']}x, normalized "
                  f"{e['normalized']}x"
                  + (f", by {e['explained_by']}"
                     if e.get("explained_by") else "") + ")", file=out)
    for e in worst:
        if e["status"] == "stale":
            print(f"  STALE {e['entry']}: box sped up but the entry "
                  f"stayed flat ({e['prev']:.3f}s -> {e['cur']:.3f}s, "
                  f"raw {e['ratio']}x) — advisory, not a regression",
                  file=out)
    n_flag = len(rep["flagged"])
    print(f"  {n_flag} flagged / {len(worst)} compared at "
          f"threshold {threshold}x; worst normalized: "
          + ", ".join(f"{e['entry']}={e['normalized']}x"
                      for e in worst[:5]), file=out)


def main() -> None:
    thr = 1.25
    args: list[str] = []
    raw = sys.argv[1:]
    i = 0
    while i < len(raw):
        a = raw[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                thr = float(raw[i + 1])
                i += 1  # consume the value token too
        else:
            args.append(a)
        i += 1
    if not args:
        print(__doc__)
        sys.exit(2)
    prev = load_bench(args[0])
    cur = load_bench(args[1]) if len(args) > 1 else \
        load_bench(json.loads(sys.stdin.read()))
    rep = compare(prev, cur, thr)
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
