"""Heavy randomized differential fuzz for the per-event fast path.

The CI suites pin per-family seeded subsets (tests/test_engine.py);
this script is the WIDE sweep — thousands of py-vs-Spark comparisons
over random JSON documents (unicode, duplicate keys, big numbers),
timestamps across years 1200-9999 (invalid dates, fractions),
doubles to ±1e30, CRLF strings, and null-bearing arrays.  Run it
manually after whitelist changes; the bar is ZERO divergences —
a fallback (the event re-routes to the Spark oracle) is fine, a
differing answer is a wrong-answer bug.

    python3 tests/pyeval_fuzz.py [seed]

r10 baseline: ~1,200 comparisons per seed, 0 divergences
(seeds 20260816 and 7).
"""

from __future__ import annotations

import calendar
import os
import random
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamsql_spark.api.facade import _NOT_APPLICABLE, StreamSQL  # noqa: E402
from streamsql_spark.session import get_spark  # noqa: E402


def build_queries(rng: random.Random):
    def rnd_json(depth=0):
        r = rng.random()
        if depth > 2 or r < 0.25:
            return rng.choice(
                ['5', '-3.25', '"x"', 'true', 'null', '1e3', '0.0001',
                 '99999999999999999999', '1.5e-2',
                 # escape-sequence surface: lone surrogates diverge
                 # (JVM '?'-replacement — must fall back), pairs and
                 # plain escapes must match
                 '"\\ud800"', '"\\ud83d\\ude00"', '"a\\u0041\\n\\t"',
                 '"q\\\\x\\""',
                 '"' + "".join(rng.choices("abß✓ ", k=3)) + '"'])
        if r < 0.6:
            n = rng.randint(0, 3)
            return '[' + ', '.join(rnd_json(depth + 1)
                                   for _ in range(n)) + ']'
        keys = rng.sample(["a", "b", "cc", "d_1", "e e"],
                          k=rng.randint(0, 3))
        return '{' + ', '.join(f'"{k}": {rnd_json(depth + 1)}'
                               for k in keys) + '}'

    def rnd_ts():
        if rng.random() < 0.15:
            return rng.choice([None, "garbage", "2024-1-5", "2024-02-30",
                               "2024-02-29 23:59:60", "0000-01-01"])
        y, mo = rng.randint(1200, 9999), rng.randint(1, 12)
        d = rng.randint(1, calendar.monthrange(y, mo)[1])
        if rng.random() < 0.3:
            return f"{y:04d}-{mo:02d}-{d:02d}"
        frac = f".{rng.randint(0, 999999):06d}" if rng.random() < 0.3 \
            else ""
        return (f"{y:04d}-{mo:02d}-{d:02d} {rng.randint(0, 23):02d}:"
                f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}{frac}")

    def rnd_str():
        return "".join(rng.choices(
            string.ascii_letters + string.digits + " .-+e",
            k=rng.randint(0, 12)))

    return [
        ("SELECT json_valid(j) AS a, json_type(j) AS b, "
         "json_length(j) AS c, from_json(j) AS d FROM stream",
         lambda: {"j": rnd_json() if rng.random() < 0.9
                  else rng.choice([None, "{bad", "nope", ""])}),
        ("SELECT day(t) AS a, hour(t) AS b, month(t) AS c, year(t) AS d,"
         " dayofweek(t) AS e, dayofyear(t) AS f, minute(t) AS g, "
         "second(t) AS h FROM stream",
         lambda: {"t": rnd_ts()}),
        ("SELECT to_seconds(t) AS a, "
         "date_format(t, 'YYYY/MM/DD HH:mi:SS') AS b FROM stream",
         lambda: {"t": rnd_ts()}),
        ("SELECT date_add(t, 1, 'month') AS a, date_sub(t, 7, 'day') AS "
         "b, date_add(t, 3, 'quarter') AS c, date_add(t, -2, 'year') "
         "AS d FROM stream",
         lambda: {"t": rnd_ts()}),
        ("SELECT date_diff(t, u, 'day') AS a, date_diff(t, u, 'minute')"
         " AS b FROM stream",
         lambda: {"t": rnd_ts(), "u": rnd_ts()}),
        ("SELECT format(v, '0.000') AS a, format(v, '0') AS b "
         "FROM stream",
         lambda: {"v": rng.choice(
             [None, rng.uniform(-1e6, 1e6), rng.uniform(-1, 1),
              rng.uniform(-1e30, 1e30), rng.randint(-100, 100),
              float(rng.randint(0, 2000)) / 1000.0])}),
        ("SELECT chr(c) AS a, from_unixtime(c * 25000000) AS b "
         "FROM stream",
         lambda: {"c": rng.choice([None, rng.randint(-2, 130),
                                   rng.randint(0, 100)])}),
        ("SELECT encode(s, 'base64') AS a, encode(s, 'hex') AS b "
         "FROM stream",
         lambda: {"s": rng.choice([None, rnd_str()])}),
        ("SELECT regexp_substring(s, '[0-9]+') AS a, "
         "regexp_substring(s, '(ab|cd)+') AS b FROM stream",
         lambda: {"s": rng.choice([None, rnd_str(), "ababcd12",
                                   "x\r\ny9"])}),
    ]


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260816
    rng = random.Random(seed)
    spark = get_spark(shuffle_partitions=4)
    n_py = n_fb = n_diff = 0
    for sql, gen in build_queries(rng):
        e = StreamSQL(spark)
        e.execute(sql)
        for _ in range(150):
            row = gen()
            py = e._emit_sync_python(dict(row))
            if py is _NOT_APPLICABLE:
                n_fb += 1
                continue
            sp = e._emit_sync_fast(dict(row))
            n_py += 1
            if py != sp:
                n_diff += 1
                print("DIVERGED:", sql[:70], row, py, sp)
    print(f"fuzz(seed={seed}): {n_py} compared, {n_fb} fell back, "
          f"{n_diff} diverged")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main())
