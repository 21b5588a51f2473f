"""Round-14 weather index (verdict ask #2) + record-time trip rulings
(ask #3): the per-session spot-weather index must be computed from the
census brackets, classify quiet vs stormy per the r12x–r13v calibration,
flow into floor_medians' session filter (so stormy sessions stop
dragging the 'settled' medians), and land in the bench record together
with mechanically-ruled guard trips. No Spark needed — all synthetic."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.bench_guard import (  # noqa: E402
    SPOT_CLEAN_COLLAPSED_FRAC,
    SPOT_CLEAN_MED_GBPS,
    census_weather_by_label,
    effective_spots,
    spot_clean,
    weather_from_census,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _brackets(spots: list[float]) -> list[dict]:
    """One census bracket per spot pair (before, after)."""
    it = iter(spots)
    rows = []
    for before in it:
        rows.append(
            {
                "key": f"q{len(rows)}",
                "membw_before_gbps": before,
                "membw_after_gbps": next(it, None),
            }
        )
    return rows


QUIET = [8.0, 9.0, 8.5, 7.9, 0.2, 8.8]  # 1/6 collapsed, median 8.25
STORMY = [2.0, 3.0, 8.0, 1.0, 2.5, 0.3]  # 5/6 collapsed, median 2.25


def test_weather_from_census_math():
    w = weather_from_census(_brackets(QUIET))
    assert w["spots_total"] == 6
    assert w["spots_collapsed"] == 1
    assert w["spot_min_gbps"] == 0.2
    assert w["spot_med_gbps"] == 8.25


def test_weather_none_without_spots():
    assert weather_from_census([]) is None
    assert weather_from_census([{"key": "q", "sec": 1.0}]) is None


def test_spot_clean_classification():
    assert spot_clean(weather_from_census(_brackets(QUIET))) is True
    assert spot_clean(weather_from_census(_brackets(STORMY))) is False
    assert spot_clean(None) is None  # pre-r12x record: old columns only


def test_spot_clean_thresholds_each_matter():
    """Mutation check: each half of the criterion must reject on its own
    — a high median with too many collapsed spots, and a clean collapse
    count with a depressed median."""
    high_med_many_collapsed = {
        "spots_total": 10,
        "spots_collapsed": int(SPOT_CLEAN_COLLAPSED_FRAC * 10) + 2,
        "spot_min_gbps": 0.1,
        "spot_med_gbps": SPOT_CLEAN_MED_GBPS + 1,
    }
    assert spot_clean(high_med_many_collapsed) is False
    low_med_few_collapsed = {
        "spots_total": 10,
        "spots_collapsed": 0,
        "spot_min_gbps": 5.0,
        "spot_med_gbps": SPOT_CLEAN_MED_GBPS - 0.5,
    }
    assert spot_clean(low_med_few_collapsed) is False


def test_effective_spots_pair_max():
    """r14 probe finding: a collapsed FIRST copy with a clean second is
    the self-inflicted post-stage stall — the effective reading is the
    pair max. Single-spot (pre-r14) brackets pass through unchanged;
    a pair where BOTH collapse stays collapsed (true bus saturation)."""
    paired = {
        "membw_before_gbps": 0.3,
        "membw_before2_gbps": 8.9,
        "membw_after_gbps": 9.1,
        "membw_after2_gbps": 0.2,
    }
    assert effective_spots(paired) == [8.9, 9.1]
    legacy = {"membw_before_gbps": 0.3, "membw_after_gbps": 9.1}
    assert effective_spots(legacy) == [0.3, 9.1]
    both_down = {"membw_before_gbps": 0.3, "membw_before2_gbps": 0.4}
    assert effective_spots(both_down) == [0.4]
    assert effective_spots({"key": "q"}) == []


def test_weather_uses_effective_spots():
    """A session whose first copies all self-stalled but whose second
    copies read clean must classify spot-clean."""
    rows = [
        {
            "membw_before_gbps": 0.3,
            "membw_before2_gbps": 8.5,
            "membw_after_gbps": 0.2,
            "membw_after2_gbps": 9.0,
        }
        for _ in range(10)
    ]
    w = weather_from_census(rows)
    assert w["spots_collapsed"] == 0
    assert spot_clean(w) is True


def test_trip_rule_signal3_ignores_self_stalled_first_copy(
    tmp_path, monkeypatch
):
    """Signal 3 must not rule EXTERNAL off a collapsed first copy whose
    paired second copy read clean — and must still fire when the pair
    agrees the bus was down."""
    import importlib

    ledger = tmp_path / "l.jsonl"
    census = tmp_path / "c.jsonl"
    sess = {
        "label": "t",
        "extended": {"k": 5.0},
        "load": {"query_steal_pct": {"k": 0.1}},
    }
    bracket = {
        "key": "k",
        "sec": 5.0,
        "worked": {},
        "membw_before_gbps": 0.3,  # self-stall…
        "membw_before2_gbps": 8.8,  # …second copy clean
        "membw_after_gbps": 9.0,
        "membw_after2_gbps": 9.2,
    }
    ledger.write_text(json.dumps(sess) + "\n")
    census.write_text(json.dumps({"label": "t", "queries": [bracket]}) + "\n")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LEDGER", str(ledger))
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(census))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import trip_rule

    tr = importlib.reload(trip_rule)
    got = tr.rule("t", "k")
    assert got["verdict"] == "ENGINE-SUSPECT"  # no laundering off a stall
    # both copies collapsed -> genuine saturation -> EXTERNAL
    bracket2 = dict(bracket, membw_before2_gbps=0.4)
    census.write_text(
        json.dumps({"label": "t", "queries": [bracket2]}) + "\n"
    )
    got = tr.rule("t", "k")
    assert got["verdict"] == "EXTERNAL" and "membw" in got["basis"]


def test_census_weather_by_label(tmp_path, monkeypatch):
    census = tmp_path / "census.jsonl"
    census.write_text(
        json.dumps({"label": "rXa", "queries": _brackets(QUIET)})
        + "\n"
        + json.dumps({"label": "rXb", "queries": _brackets(STORMY)})
        + "\n"
        + json.dumps({"label": None, "queries": _brackets(QUIET)})
        + "\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(census))
    by = census_weather_by_label()
    assert set(by) == {"rXa", "rXb"}
    assert spot_clean(by["rXa"]) and not spot_clean(by["rXb"])


def test_floor_medians_excludes_stormy_sessions(monkeypatch, tmp_path):
    """The ask itself: two sessions identical on the OLD settled columns
    (steal 0, low load) — the stormy-spot one must be excluded from the
    medians unless --legacy-settled asks for the old behavior."""
    census = tmp_path / "census.jsonl"
    census.write_text(
        json.dumps({"label": "quietS", "queries": _brackets(QUIET)})
        + "\n"
        + json.dumps({"label": "stormS", "queries": _brackets(STORMY)})
        + "\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(census))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import floor_medians

    floor = {"q": 1.0}
    rec = {
        "queries": {"q": 1.0},
        "load": {"start": [0.1, 0.1, 0.1], "steal_pct": 0.0},
    }
    paths = [("quietS", dict(rec)), ("stormS", dict(rec))]
    used, skipped = floor_medians.load_sessions(list(paths), floor)
    assert [n for n, _ in used] == ["quietS"]
    assert any("stormy" in why for _, why in skipped)
    # legacy mode: both pass, exactly as r08–r13 medians were taken
    used, skipped = floor_medians.load_sessions(
        list(paths), floor, require_spot_clean=False
    )
    assert [n for n, _ in used] == ["quietS", "stormS"]


def test_floor_medians_prefers_in_record_weather(monkeypatch, tmp_path):
    """A record that CARRIES load.weather (r14+ bench.py) is judged on
    it without any census lookup."""
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(tmp_path / "none.jsonl"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import floor_medians

    floor = {"q": 1.0}
    stormy_w = weather_from_census(_brackets(STORMY))
    rec = {
        "queries": {"q": 1.0},
        "load": {
            "start": [0.1, 0.1, 0.1],
            "steal_pct": 0.0,
            "weather": stormy_w,
        },
    }
    used, skipped = floor_medians.load_sessions([("s", rec)], floor)
    assert used == [] and any("stormy" in why for _, why in skipped)


def test_bench_attaches_weather_and_rulings(monkeypatch, tmp_path):
    """bench.py's record-time integration (ask #3 'tests pin the
    integration'): a record with one guard trip gains load.weather and a
    trip_rulings list naming exactly that key; a steal burst during the
    tripped query is ruled EXTERNAL by signal 1."""
    # point trip_rule's history files away from the repo's real ones
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LEDGER", str(tmp_path / "l.jsonl"))
    monkeypatch.setenv("SPARK_GRAFT_CENSUS_OUT", str(tmp_path / "c.jsonl"))
    monkeypatch.setenv("SPARK_GRAFT_SESSION_LABEL", "itest")
    import bench

    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        floors = json.load(fh)
    key = "wordcount"
    ref = floors["headline"][key]
    record = {
        "queries": {key: ref * 3 + 1.0},
        "extended": {},
        "load": {"query_steal_pct": {key: 5.0}},
    }
    # every other floored key must be present or check() reports it —
    # fill them at floor so exactly one key trips
    for k, v in {**floors["headline"], **floors["extended"]}.items():
        record["queries"].setdefault(k, v)
    bench.attach_weather_and_rulings(record, _brackets(QUIET))
    assert record["load"]["weather"]["spot_clean"] is True
    assert [r["key"] for r in record["trip_rulings"]] == [key]
    assert record["trip_rulings"][0]["verdict"] == "EXTERNAL"
    assert record["trip_rulings"][0]["label"] == "itest"
    assert "trip_rulings_error" not in record
