"""Bench stdout-artifact contract (r20 — the r19 verdict's "harden the
bench artifact contract" item).

The driver archives only the LAST 2000 chars of bench stdout; when its
live parse of the verbose JSON line failed in r18, every per-query
round-over-round comparison was lost because the tail alone could not
reconstruct the medians map. bench.compact_line is the insurance: a
FINAL compact contract-superset line whose trailing segment (qv values
array + scalars + value) is guaranteed to survive any 2000-char tail
cut. These tests pin that guarantee against the committed r19 artifact
(77 real entries — the realistic size), with NO Spark session.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def _r19_result() -> dict:
    with open(os.path.join(HERE, "BENCH_LOCAL_r19.json")) as f:
        return json.load(f)


def test_compact_line_is_valid_json_with_contract_fields():
    line = bench.compact_line(_r19_result())
    assert "\n" not in line
    parsed = json.loads(line)
    # the driver contract fields, all present in the LAST line
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    assert parsed["unit"] == "sec"
    assert len(parsed["queries"]) == parsed["n_queries"] == 77


def test_compact_tail_suffix_reconstructs_medians():
    """The segment from '"qv"' to the end — the part a 2000-char tail
    is guaranteed to keep — must fit well under 2000 chars and must
    reconstruct the full medians map by zipping with sorted names."""
    result = _r19_result()
    line = bench.compact_line(result)
    suffix = line[line.index('"qv"') :]
    assert len(suffix) < 1900, len(suffix)
    # tail-only recovery: parse the suffix as a JSON object
    tail_obj = json.loads("{" + suffix)
    names = sorted(result["queries"])
    recovered = dict(zip(names, tail_obj["qv"]))
    for n in names:
        assert recovered[n] == round(result["queries"][n], 2), n
    assert tail_obj["value"] == result["value"]
    assert tail_obj["cal"] == round(result["calibration"]["median_sec"], 3)


def test_compact_queries_map_matches_qv_order():
    result = _r19_result()
    parsed = json.loads(bench.compact_line(result))
    assert list(parsed["queries"]) == sorted(result["queries"])
    assert parsed["qv"] == [parsed["queries"][n] for n in parsed["queries"]]
