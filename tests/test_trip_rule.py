"""tools/trip_rule.py — the executable trip-attribution rule that closed
the round-12/13 excursion watches (SCALING_r13.md). Mutation-style
checks over synthetic ledger/census records: each of the three signals
must fire on its own evidence, in strength order, and the absence of
every signal must come back ENGINE-SUSPECT (never a silent EXTERNAL)."""

from __future__ import annotations

import importlib
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write(tmp_path, monkeypatch, session, census_queries, extra_census=()):
    ledger = tmp_path / "ledger.jsonl"
    census = tmp_path / "census.jsonl"
    ledger.write_text(json.dumps(session) + "\n")
    lines = [
        json.dumps({"label": "quiet", "queries": list(extra_census)}),
        json.dumps({"label": "t", "queries": census_queries}),
    ]
    census.write_text("\n".join(lines) + "\n")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LEDGER", str(ledger))
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(census))
    import trip_rule

    return importlib.reload(trip_rule)


def _session(steal):
    return {
        "label": "t",
        "queries": {},
        "extended": {"k": 5.0},
        "load": {"query_steal_pct": {"k": steal}},
    }


def _bracket(**kw):
    base = {
        "key": "k",
        "sec": 5.0,
        "n_before": 2,
        "n_after": 2,
        "spawned": 0,
        "died": 0,
        "spawned_pids": [],
        "died_pids": [],
        "worked": {},
        "membw_before_gbps": 9.0,
        "membw_after_gbps": 9.0,
    }
    base.update(kw)
    return base


def test_signal1_steal_rules_external(tmp_path, monkeypatch):
    tr = _write(tmp_path, monkeypatch, _session(2.5), [_bracket()])
    got = tr.rule("t", "k")
    assert got["verdict"] == "EXTERNAL"
    assert "steal" in got["basis"]


def test_signal2_cpu_inflation_rules_external(tmp_path, monkeypatch):
    # quiet session pins the key's best cycles-per-work at 1.0 s; the
    # trip bracket burns 4x that at constant layout with zero churn
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0})],
        extra_census=[_bracket(sec=1.2, worked={"50": 1.0})],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "EXTERNAL"
    assert "cycles-per-work" in got["basis"]


def test_signal2_abnormal_churn_is_engine_suspect(tmp_path, monkeypatch):
    # a worker DYING mid-key is not weather — the rule must refuse the
    # external attribution and demand a bisect
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0}, died_pids=[99], died=1)],
        extra_census=[_bracket(sec=1.2, worked={"50": 1.0})],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"
    assert "churn" in got["basis"]


def test_signal3_spot_collapse_rules_external(tmp_path, monkeypatch):
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(membw_after_gbps=0.3)],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "EXTERNAL"
    assert "membw" in got["basis"]


def test_no_signal_is_engine_suspect_not_external(tmp_path, monkeypatch):
    """The rule must never launder an unexplained regression as weather:
    clean steal + flat CPU + clean spots -> ENGINE-SUSPECT."""
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 1.1})],
        extra_census=[_bracket(sec=1.2, worked={"50": 1.0})],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"
    assert "bisect" in got["basis"]


def test_no_census_basis_names_absent_channels(tmp_path, monkeypatch):
    """A census-off session (qs empty) must still default ENGINE-SUSPECT
    (anti-laundering), but the basis must SAY the CPU/spot channels had
    no data and point at the isolated-replay probe — r14n shipped a gram
    ENGINE-SUSPECT that read like 'all channels clean' when in fact no
    channel existed."""
    tr = _write(tmp_path, monkeypatch, _session(0.1), [_bracket()])
    got = tr.rule_record(
        {
            "queries": {},
            "extended": {"k": 5.0},
            "load": {"query_steal_pct": {"k": 0.1}},
        },
        None,  # census off
        {"k": 1.0},
        label="mem",
    )[0]
    assert got["verdict"] == "ENGINE-SUSPECT"
    assert "ABSENT" in got["basis"]
    assert "probe_key_replay" in got["basis"]


def test_signal2_worker_count_laundering_blocked(tmp_path, monkeypatch):
    """ADVICE r13: a quiet session that spread the key over 4 workers
    must NOT supply the per-worker floor for a 1-worker bracket — the
    parallelism change alone doubles max-per-worker with zero external
    interference. Incomparable worker counts -> no signal-2 EXTERNAL."""
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0})],
        extra_census=[
            _bracket(sec=1.2, worked={"50": 1.0, "51": 1.0, "52": 1.0, "53": 1.0})
        ],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"


def test_signal2_pool_total_guard_blocks_constant_work(tmp_path, monkeypatch):
    """ADVICE r13, second arm: same TOTAL work concentrated on fewer
    workers inflates the max but not the pool total — must not be ruled
    EXTERNAL as cycles-per-work inflation."""
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0})],  # max 4.0, total 4.0
        extra_census=[_bracket(sec=1.2, worked={"50": 2.0, "51": 2.0})],
        # comparable count (2 vs 1 is within 2x); max 2.0, total 4.0:
        # max ratio 2x fires, total ratio 1x does not -> blocked
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"


def test_signal2_true_inflation_still_fires(tmp_path, monkeypatch):
    """Genuine cycles-per-work inflation (max AND total both >= 2x a
    comparable-width floor) must still be ruled EXTERNAL — the ADVICE
    guards must not kill the signal itself."""
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0, "101": 4.0})],
        extra_census=[_bracket(sec=1.2, worked={"50": 1.0, "51": 1.0})],
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "EXTERNAL"
    assert "cycles-per-work" in got["basis"]


def test_pool_full_width_derived_from_census(tmp_path, monkeypatch):
    """ADVICE r13: full-width comes from the census itself, not a
    hardcoded 30. History shows an 8-wide pool; spawn churn at
    n_before=8 must be classed abnormal -> ENGINE-SUSPECT."""
    tr = _write(
        tmp_path,
        monkeypatch,
        _session(0.1),
        [_bracket(worked={"100": 4.0}, spawned=1, n_before=8, n_after=8)],
        extra_census=[
            _bracket(sec=1.2, worked={"50": 1.0}, n_before=8, n_after=8)
        ],
    )
    monkeypatch.delenv("SPARK_GRAFT_POOL_FULL_WIDTH", raising=False)
    assert tr._pool_full_width() == 8
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"
    assert "churn" in got["basis"]
    # env override: a 100-wide pool makes n_before=8 normal growth again
    monkeypatch.setenv("SPARK_GRAFT_POOL_FULL_WIDTH", "100")
    got = tr.rule("t", "k")
    assert "churn" not in got.get("basis", "")


def test_rule_record_rules_in_memory_trips(tmp_path, monkeypatch):
    """bench.py integration surface (round-13 ask #3): an IN-MEMORY
    record with one guard trip comes back with exactly that key ruled,
    before anything exists on disk; a clean record -> []."""
    tr = _write(tmp_path, monkeypatch, _session(0.1), [_bracket()])
    floor = {"k": 1.0, "ok": 1.0}
    record = {
        "queries": {"ok": 0.9},
        "extended": {"k": 5.0},  # 5x floor, > ABS_SLACK -> trips
        "load": {"query_steal_pct": {"k": 2.5}},
    }
    rulings = tr.rule_record(record, [_bracket()], floor, label="mem")
    assert [r["key"] for r in rulings] == ["k"]
    assert rulings[0]["verdict"] == "EXTERNAL"  # steal 2.5% >= 1%
    assert rulings[0]["label"] == "mem"
    clean = {"queries": {"ok": 0.9, "k": 1.0}, "load": {}}
    assert tr.rule_record(clean, [], floor) == []


def test_real_r13_rulings_reproduced():
    """Against the committed r13 evidence files: the rule reproduces the
    round's manual rulings (r13h gram = steal; r13c similarity_join =
    spot corroboration) — keeps the tool honest against the records the
    judge reads."""
    for var in ("SPARK_GRAFT_BENCH_LEDGER", "SPARK_GRAFT_CENSUS_OUT"):
        os.environ.pop(var, None)
    import trip_rule

    tr = importlib.reload(trip_rule)
    if tr._session("r13h") is None:
        pytest.skip("r13 ledger entries not present in this checkout")
    got = tr.rule("r13h", "embedding_gram_matrix")
    assert got["verdict"] == "EXTERNAL" and "steal" in got["basis"]
    got = tr.rule("r13c", "similarity_join")
    assert got["verdict"] == "EXTERNAL"
