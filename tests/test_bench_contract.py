"""bench.py's stdout contract.

The driver keeps only the LAST 2000 chars of combined stdout
(BENCH_r05.json's "tail" field is exactly 2000 chars and starts
mid-line); rounds 3, 4 and 5 each lost their official headline record
to overflowing or crashing that window. These tests pin the printed
line comfortably inside it even with a worst-case registry, without
needing a SparkSession (build_output is pure).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_line_fits_driver_window():
    # worst case: every known query present with a 4-digit timing, plus
    # a pile of long-named extras and 10 errors
    times = {f"some_future_query_with_long_name_{i:03d}": 1234.567
             for i in range(120)}
    for n in bench.FLAGSHIP + bench.R1_COMMON + bench.HEADLINE:
        times[n] = 9999.999
    errors = {f"some_future_query_with_long_name_{i:03d}": "X" * 200
              for i in range(10)}
    out = bench.build_output(times, errors, reps=2, sf=0.1)
    line = json.dumps(out)
    assert len(line) <= 1500, f"{len(line)} bytes won't survive the tail window"
    # the scalars the scorer needs are all on the line
    assert out["value"] > 0
    assert out["r1_common_value"] > 0
    assert out["r1_common_n"] == len(bench.R1_COMMON)
    assert out["errors"] == 10
    # only the fixed flagship basket rides along
    assert set(out.get("queries", {})) <= set(bench.FLAGSHIP)


def test_headline_line_carries_isolated_r1_basket():
    """VERDICT r9 next #2: the isolated r1-common number must ride the
    printed line alongside the in-suite one, and still fit the window."""
    times = {n: 9999.999 for n in bench.HEADLINE}
    out = bench.build_output(times, {}, reps=2, sf=0.1, calib=0.123,
                             r1_iso=41.532)
    assert out["r1_common_isolated"] == 41.532
    assert out["r1_common_value"] > 0  # both readings present
    assert len(json.dumps(out)) <= 1500


def test_headline_line_normal_case_has_flagships():
    times = {n: 1.234 for n in bench.HEADLINE}
    out = bench.build_output(times, {}, reps=2, sf=0.1)
    assert len(json.dumps(out)) <= 1500
    present = set(bench.FLAGSHIP) & set(bench.HEADLINE)
    assert set(out["queries"]) == present


def test_r1_common_matches_recorded_baseline_set():
    """R1_COMMON must stay in lockstep with what BENCH_r01.json actually
    recorded — the round-over-round basket is only meaningful if fixed."""
    with open(os.path.join(REPO, "BENCH_r01.json")) as f:
        rec = json.load(f)
    assert sorted(bench.R1_COMMON) == sorted(rec["parsed"]["queries"])


def test_flagship_and_slope_are_benched_queries():
    assert set(bench.FLAGSHIP) <= set(bench.HEADLINE)
    assert set(bench.SLOPE) <= set(bench.HEADLINE)


def test_headline_line_names_fully_failed_queries():
    """A query failing ALL reps must surface on the line itself (a
    shrunken total must not read as a speedup)."""
    times = {n: 1.0 for n in bench.HEADLINE if n != "q1_pricing_summary"}
    out = bench.build_output(times, {"q1_pricing_summary": "boom"},
                             reps=2, sf=0.1)
    assert out["missing"] >= 1
    assert "q1_pricing_summary" in out["missing_names"]
    assert len(json.dumps(out)) <= 1500
