"""Bench host-noise sentinels (VERDICT r6 #4) — no Spark needed.

`bench.py` re-measures a frozen sentinel set every run and emits
`sentinel_ratio_vs_prev` (median current/previous seconds against the
newest BENCH_r*.json) so a uniform host slowdown is machine-separable
from a code regression. These tests pin the parsing of both BENCH file
shapes (raw bench output vs the driver's tail-wrapped capture) and the
ratio arithmetic.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sentinels_are_headline_queries(bench):
    """A sentinel must actually be measured every run."""
    assert set(bench.SENTINELS) <= set(bench.HEADLINE)


def test_sentinel_set_is_wide_and_has_basis_values(bench):
    """VERDICT r9 #4: ≥9 frozen-plan sentinels spanning shapes, each
    with a prev value in the committed basis file so its ratio computes
    from the very next run."""
    assert len(bench.SENTINELS) >= 9
    with open(os.path.join(REPO, "BENCH_SENTINELS.json"), encoding="utf-8") as fh:
        basis = json.load(fh)
    missing = [s for s in bench.SENTINELS if s not in basis["queries"]]
    assert not missing, f"sentinels without a basis value: {missing}"


def test_payload_queries_raw_and_tail_wrapped(bench):
    raw = {"metric": "x", "queries": {"q1": 0.5}, "sf": 0.1}
    assert bench._payload_queries(raw) == ({"q1": 0.5}, 0.1)
    wrapped = {
        "n": 6,
        "sf": 0.1,
        "tail": '   \r{"metric": "headline_queries_total", "value": 1.0, '
        '"queries": {"q1": 0.5, "q2": 2.0}, "sf": 0.1}\n',
    }
    assert bench._payload_queries(wrapped) == ({"q1": 0.5, "q2": 2.0}, 0.1)
    assert bench._payload_queries({"tail": "garbage"}) == (None, None)
    assert bench._payload_queries({"queries": {}}) == (None, None)
    assert bench._payload_queries(None) == (None, None)


def test_prev_bench_prefers_committed_basis_then_newest_round(bench, tmp_path):
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"queries": {"q1": 1.0}, "sf": 0.1})
    )
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"queries": {"q1": 2.0}, "sf": 0.1})
    )
    (tmp_path / "BENCH_r11.json").write_text("not json")
    name, queries, sf = bench._prev_bench_queries(str(tmp_path))
    assert name == "BENCH_r10.json"  # r11 unreadable, r10 beats r2
    assert queries == {"q1": 2.0} and sf == 0.1
    # the committed basis file, when present, beats every BENCH_r*.json
    # (BENCH_r10+ carry no queries dict at all — bounded stdout)
    (tmp_path / "BENCH_SENTINELS.json").write_text(
        json.dumps({"queries": {"q1": 3.0}, "sf": 0.1})
    )
    name, queries, sf = bench._prev_bench_queries(str(tmp_path))
    assert name == "BENCH_SENTINELS.json"
    assert queries == {"q1": 3.0} and sf == 0.1
    assert bench._prev_bench_queries(str(tmp_path / "empty")) == (
        None,
        None,
        None,
    )


def test_sentinel_ratio_is_median_and_survives_gaps(bench, monkeypatch):
    prev = {name: 1.0 for name in bench.SENTINELS}
    monkeypatch.setattr(
        bench,
        "_prev_bench_queries",
        lambda d=None: ("BENCH_r6.json", prev, 0.1),
    )
    # uniform 1.25x host shift -> ratio 1.25 even with one stalled outlier
    cur = {name: 1.25 for name in bench.SENTINELS}
    cur[bench.SENTINELS[0]] = 9.0
    out = bench._sentinel_fields(cur, 0.1)
    assert out["sentinel_ratio_vs_prev"] == 1.25
    assert out["sentinel_prev_bench"] == "BENCH_r6.json"
    assert out["sentinels"][bench.SENTINELS[1]] == {
        "sec": 1.25,
        "prev_sec": 1.0,
        "ratio": 1.25,
    }
    # a sentinel that errored this run is reported but excluded
    del cur[bench.SENTINELS[2]]
    assert bench._sentinel_fields(cur, 0.1)["sentinels"][
        bench.SENTINELS[2]
    ] == {"sec": None, "prev_sec": 1.0}
    # a cross-sf comparison would measure data growth, not the host
    out = bench._sentinel_fields(cur, 0.001)
    assert out["sentinel_ratio_vs_prev"] is None
    assert "ratio" not in out["sentinels"][bench.SENTINELS[1]]
    # fresh checkout: no previous bench -> null ratio, no crash
    monkeypatch.setattr(
        bench, "_prev_bench_queries", lambda d=None: (None, None, None)
    )
    out = bench._sentinel_fields(cur, 0.1)
    assert out["sentinel_ratio_vs_prev"] is None
    assert out["sentinel_prev_bench"] is None


def test_stdout_payload_stays_driver_parseable_and_bounded(bench, monkeypatch):
    """Regression for r7's AND r9's parsed:null benches, updated for the
    r12 per-query restoration (VERDICT r11 #2): the stdout JSON line
    carries metric/value/unit/sf/n_queries plus a COMPACT per-query
    dict, and its compact rendering must stay under TAIL_BUDGET no
    matter how large the headline catalog grows — past the budget the
    per-query dict is dropped (bounded degradation), never truncated.
    Full-precision seconds, errors and the sentinel block ride the side
    file."""
    monkeypatch.setattr(
        bench, "_prev_bench_queries", lambda d=None: (None, None, None)
    )
    payload, side = bench._assemble_payloads(
        {"q1": 1.5, "q2": 0.5}, {}, "/root/testdata/sf0.1"
    )
    assert list(payload) == [
        "metric", "value", "unit", "sf", "n_queries", "queries",
    ]
    assert payload["value"] == 2.0 and payload["sf"] == 0.1
    assert payload["n_queries"] == 2
    assert payload["queries"] == {"q1": 1.5, "q2": 0.5}
    assert side["queries"] == {"q1": 1.5, "q2": 0.5}
    assert {
        "sentinels",
        "sentinel_ratio_vs_prev",
        "sentinel_prev_bench",
    } <= set(side)
    # the CURRENT headline catalog must fit the budget with the
    # per-query dict included — that is the whole point of the r12 fix
    cur = {name: 9.999 for name in bench.HEADLINE}
    payload, _ = bench._assemble_payloads(cur, {}, "/root/testdata/sf0.1")
    assert "queries" in payload
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= bench.TAIL_BUDGET < 2000
    # compact seconds: ~3 significant digits, keys never renamed
    assert payload["queries"][bench.HEADLINE[0]] == 10.0
    assert bench._compact_seconds(0.256) == 0.26
    assert bench._compact_seconds(12.34) == 12.3
    assert bench._compact_seconds(123.456) == 123
    # a 1000-query catalog overflows the budget -> the per-query dict
    # is DROPPED from stdout (still in the side file), line stays small
    huge = {f"q_very_long_query_name_{i:04d}": 123.456 for i in range(1000)}
    payload, side = bench._assemble_payloads(huge, {}, "/root/testdata/sf0.1")
    assert "queries" not in payload
    assert len(json.dumps(payload)) < 500
    assert payload["n_queries"] == 1000
    assert len(side["queries"]) == 1000
    # failures null the headline value, stay bounded (error DETAILS go
    # to the side file), and never add sentinel keys to stdout
    payload, side = bench._assemble_payloads(
        {"q1": 1.5}, {"q2": "Boom " * 100}, "/root/testdata/sf0.1"
    )
    assert payload["value"] is None
    assert payload["partial_total"] == 1.5
    assert payload["n_errors"] == 1
    assert "errors" not in payload and "sentinels" not in payload
    assert len(json.dumps(payload)) < 500
    assert side["errors"]["q2"].startswith("Boom")


def test_sentinel_block_cannot_dirty_the_tree_by_default(bench):
    """VERDICT r8 #4: a plain bench run (what the driver invokes) must
    write the sentinel block ONLY to the gitignored side file; the
    committed BENCH_SENTINELS.json advances only under an explicit
    --commit-sentinels."""
    default = bench._sentinel_targets([])
    assert [os.path.basename(p) for p in default] == [".bench_sentinels.json"]
    committed = bench._sentinel_targets(["--commit-sentinels"])
    assert [os.path.basename(p) for p in committed] == [
        ".bench_sentinels.json",
        "BENCH_SENTINELS.json",
    ]
    # the untracked name is actually gitignored
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(repo, ".gitignore"), encoding="utf-8") as fh:
        assert ".bench_sentinels.json" in fh.read()
