"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (wordcount — the lab's own
hello-world, MIT 6.824 Lab 1 ``mrapps/wc.go``; SURVEY.md §7.1) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator registry of
:mod:`mapreduce_6_824_lab1_spark` — one entry per implemented operator from
SURVEY.md §2, each paired with its DuckDB oracle unless genuinely
non-SQL-expressible (sketch-based dedup keys: xxhash64 signatures have no
DuckDB equivalent → rows-only per the driver contract).
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from mapreduce_6_824_lab1_spark import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO = Path(__file__).resolve().parent


def _row_passed(row: object) -> bool:
    """A CORRECTNESS row counts as verified only if it recorded success —
    a failed row must rotate its key BACK into the window for re-checking,
    not hide it behind the verified group forever."""
    if not isinstance(row, dict):
        return False  # unknown shape: treat as unverified so it re-rotates in
    if row.get("err") not in (None, "no_oracle"):
        return False
    return all(
        row.get(k) in (True, None)
        for k in ("rows_match", "schema_match", "hash_match")
    )


def _driver_verified_rounds() -> dict[str, int]:
    """Map key -> latest round number with a SUCCESSFUL driver row.

    The driver verifies exactly the first 50 keys of ``queries()`` in
    iteration order; with 160+ registered keys a fixed order would leave
    two-thirds of the registry permanently unverified.  Reading the
    accumulated ``CORRECTNESS_r*.json`` files at import time makes the
    ordering self-rotating: every round the 50-key window lands on keys
    with no prior passing driver row, until the union covers the whole
    registry — and any key that ever FAILED re-enters the window.
    """
    seen: dict[str, int] = {}
    for rnd, data in _correctness_rounds():
        for k, row in data.items():
            if _row_passed(row):
                seen[k] = max(rnd, seen.get(k, 0))
    return seen


def _correctness_rounds() -> list[tuple[int, dict]]:
    """All readable CORRECTNESS_r*.json files as (round, rows) pairs."""
    out: list[tuple[int, dict]] = []
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
        except ValueError:
            rnd = 0
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            out.append((rnd, data))
    return out


def _driver_failed_keys() -> list[str]:
    """Keys whose LATEST driver row failed (err, or an explicit False on
    rows/schema/hash).  These jump to the absolute head of the window:
    a red row must be re-checked the very next round, not buried behind
    family interleaving (``cdc_apply_latest`` sat unverified for a round
    because its 1-key family landed at fraction 0.5 of a 150-key fresh
    list — past slot 50)."""
    latest: dict[str, tuple[int, bool]] = {}
    for rnd, data in _correctness_rounds():
        for k, row in data.items():
            prev = latest.get(k)
            if prev is None or rnd >= prev[0]:
                latest[k] = (rnd, _row_passed(row))
    return [k for k, (_, ok) in latest.items() if not ok]


_CHANGED_PIN_KEYS: dict[str, int] = {
    # Round-8 verdict ask #1: a key whose SOURCE changed after its last
    # green driver row must re-enter the window in the round it changed.
    # The durable mechanism is the source-hash manifest (manifest.py);
    # this hand-pin covers changes the manifest can't see — helper-level
    # rewrites, and the bootstrap case below, whose body changed in r08
    # (driver collect -> lazy file-sink) AFTER its r06 driver row but
    # BEFORE the manifest existed. Value = the minimum round whose green
    # driver row satisfies the pin; once CORRECTNESS records a pass at
    # that round or later, the pin expires automatically.
    "stream_asof_enrich": 8,
    # Round-9 self-review: _run_session_stream — the harness BOTH custom
    # sessionizers run through — was rewritten this round (sleep-based
    # staging -> explicit _stamp_mtime ordering). A helper-level change
    # the function-grain manifest can't see: exactly what this hand-pin
    # convention exists for.
    "stream_session_stateful": 9,
    "stream_session_tws": 9,
}


_PRIORITY_KEYS = (
    # Round-6 verdict ask #1: the final 6 never-driver-verified keys,
    # window-pinned so the CORRECTNESS_r07 union closes at 264/264.
    # All six were sim-green in the judge's own round-6 re-run; pinning
    # them at the window head is pure evidence plumbing. After these,
    # the window tail falls through to previously-verified keys
    # stalest-first (verdict ask #4 — the regression cycle starts on the
    # r01-era temporal/dedup/similarity evidence).
    "dedup_substring_ngrams",
    "events_forecast_baseline",
    "events_rolling_wau",
    "join_asof_tolerance",
    "scalar_array_quantifiers",
    "timeseries_decay_sum",
)


def _changed_keys() -> set[str]:
    """Keys whose source changed since the last manifest snapshot — the
    rotation's CHANGED tier (see manifest.py). Import must never fail
    the driver over a manifest problem: degrade to the empty set — but
    LOUDLY (round-9 advice): a blanket silent except would turn any
    future manifest regression into an invisibly-dead changed tier, so
    only the expected failure modes are caught and each prints one line
    to stderr, which the driver log preserves."""
    try:
        from mapreduce_6_824_lab1_spark.manifest import changed_keys

        return changed_keys()
    except (ImportError, OSError, ValueError, KeyError, TypeError) as exc:
        print(
            f"warning: changed-key tier disabled this run "
            f"({type(exc).__name__}: {exc})",
            file=sys.stderr,
        )
        return set()
    except Exception as exc:  # noqa: BLE001 — driver must not fail, but loudly
        print(
            f"warning: changed-key tier disabled by UNEXPECTED "
            f"{type(exc).__name__}: {exc} — investigate manifest.py",
            file=sys.stderr,
        )
        return set()


def _rotated_keys() -> list[str]:
    """Registry keys: latest-row-FAILED keys at the absolute head (a red
    driver row is re-checked the very next round), then CHANGED keys —
    previously-verified keys whose source hash differs from the manifest
    snapshot (manifest.py) or whose _CHANGED_PIN_KEYS hand-pin is still
    unsatisfied (the driver-green chain must track the code that actually
    ships, so a rewritten operator re-enters the window the round it
    changes) — then still-unverified _PRIORITY_KEYS (explicit verdict
    asks), then never-driver-verified keys so the driver's [0:50] window
    always checks fresh keys, then previously-verified keys
    stalest-first. WITHIN the fresh group, keys are
    round-robined across operator families (prefix before the first '_'):
    with more fresh keys than window slots, plain registry order would
    starve whole families registered late in the import order (the
    ``stream_*``/``source_*`` keys sat past the window edge for two
    rounds) — interleaving guarantees every family lands slots each round.
    Verified keys follow, STALEST-first (lowest last-verified round), so
    once the registry is fully covered the window cycles back over the
    oldest evidence and a silent regression can't hide forever."""
    seen = _driver_verified_rounds()
    keys = list(QUERIES)
    order = {k: i for i, k in enumerate(keys)}
    failed = [k for k in _driver_failed_keys() if k in order]
    failed.sort(key=lambda k: order[k])
    failed_set = set(failed)
    # changed tier: auto-detected source drift on VERIFIED keys (a fresh
    # key is already ahead of the stale queue) plus unexpired hand-pins
    changed = sorted(
        (
            {k for k in _changed_keys() if k in order and k in seen}
            | {
                k
                for k, need in _CHANGED_PIN_KEYS.items()
                if k in order and seen.get(k, -1) < need
            }
        )
        - failed_set,
        key=lambda k: order[k],
    )
    failed_set |= set(changed)
    priority = sorted(
        (
            k
            for k in _PRIORITY_KEYS
            if k in order and k not in seen and k not in failed_set
        ),
        key=lambda k: order[k],
    )
    failed_set |= set(priority)  # exclude from the interleaved fresh group
    fresh = [k for k in keys if k not in seen and k not in failed_set]

    families: dict[str, list[str]] = {}
    for k in fresh:  # registry order preserved within each family
        families.setdefault(k.split("_", 1)[0], []).append(k)
    # spread each family uniformly over the fresh list: key i of an
    # n-key family sits at fraction (i+0.5)/n, so a window of any size
    # takes a ~proportional share of every family (largest debt, most
    # slots) and every family's first key lands early
    frac = {
        k: (i + 0.5) / len(fam)
        for fam in families.values()
        for i, k in enumerate(fam)
    }
    interleaved = sorted(fresh, key=lambda k: (frac[k], order[k]))

    stale = sorted(
        (k for k in keys if k in seen and k not in failed_set),
        key=lambda k: (seen[k], order[k]),
    )
    return failed + changed + priority + interleaved + stale


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in _rotated_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omissions = rows-only checks)."""
    return dict(ORACLES)
