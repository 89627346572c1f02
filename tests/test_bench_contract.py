"""Pin the bench.py stdout contract.

The recording harness keeps only the last 2000 bytes of stdout (observed
in BENCH_r1..r3: a 2000-char `tail` truncated mid-JSON, `parsed: null`),
so the single JSON line bench.py prints must stay comfortably inside
that window no matter how many queries the registry grows to.
"""

import json

import bench
from sparkify_datalake_spark.registry import queries


def _fake_timings(n_extra: int = 0) -> dict[str, float]:
    t = {name: 0.123 for name in queries()}
    for i in range(n_extra):
        t[f"extra_query_with_a_long_name_{i:04d}"] = 123.456
    return t


def test_compact_line_fits_harness_tail_window():
    t = _fake_timings()
    line = bench.compact_line(t, sum(t.values()), 0.1)
    assert len(line) <= 1900
    assert "\n" not in line


def test_compact_line_parses_and_keeps_headline_queries():
    t = _fake_timings()
    parsed = json.loads(bench.compact_line(t, 99.9, 0.1))
    assert parsed["metric"] == "total_query_wall_seconds"
    assert parsed["value"] == 99.9
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(t)
    # Headline queries survive truncation; they are inserted first.
    for name in bench.HEADLINE:
        if name in t:
            assert name in parsed["queries"], name


def test_headline_names_all_exist_in_registry():
    q = queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert missing == [], f"stale HEADLINE entries: {missing}"


def test_compact_line_fits_even_with_many_more_queries():
    # Registry at 3x today's size must still fit the window.
    t = _fake_timings(n_extra=2 * len(queries()))
    line = bench.compact_line(t, sum(t.values()), 0.1)
    assert len(line) <= 1900
    assert json.loads(line)["n_queries"] == len(t)
