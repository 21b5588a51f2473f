"""Key source manifest — the rotation's CHANGED-KEY tier (round-8 verdict
ask #1).

The driver verifies the first 50 keys of ``queries()``; the rotation in
``__spark_entry__`` orders failed → fresh → stalest keys. That left one
gap: a key whose BODY was rewritten after its last green driver row
(``stream_asof_enrich`` in round 8: collect → lazy file-sink, latest
driver row still r06) had no tier — the code the driver had verified no
longer existed, yet the key sat deep in the stale queue.

``KEY_SOURCE_MANIFEST.json`` (repo root) records, per registry key, a
sha256 over the key function's source text plus its oracle SQL, snapshot
at the LAST ROUND'S CLOSE — i.e. the source the most recent driver rows
actually verified. Any key whose current hash differs joins the window
head (after failed keys), so modified operators always re-enter the
driver window in the round they change.

Refresh discipline: run ``python tools/refresh_source_manifest.py
<round>`` at ROUND START, before editing, while the tree still equals
the previous round's close. Enforced by
tests/test_entry_rotation.py::test_manifest_covers_every_driver_verified_key,
which requires the stamped ``round`` to EQUAL the latest
CORRECTNESS_r*.json round on disk — so the moment a new round's driver
evidence lands, the suite stays red until the manifest is re-snapshot,
making refresh the forced first action of a round. The test cannot
detect a refresh run late WITHIN a round (after mid-round edits — the
under-report direction); that hole is covered by convention plus the
hand-pin escape hatch (``_CHANGED_PIN_KEYS``), and refreshing too
rarely only OVER-reports changes (a verified key stays pinned one
extra round — conservative).

Granularity: the hash covers the key FUNCTION's own source segment, its
oracle string, AND the source of every same-package callable the
function invokes by bare name (``ast.Call`` over ``ast.Name``, resolved
through ``fn.__globals__`` — one level, no recursion). The one-level
closure is what makes "extract the body into a helper" safe: the
round-9 self-review found that extracting
``stream_session_timers_tws``'s body into ``_run_timer_sessions``
reduced the function-only hash to a one-line wrapper, silently
reopening the stream_asof_enrich gap this mechanism exists to close.
Whole-module hashing stays rejected (one-line edits would flag every
key in the file and displace the stalest-first sweep). Still invisible,
by accepted limitation: helpers' helpers, methods inherited from an
edited base class, and attribute-call helpers (``obj.method(...)``) —
those remain the hand-pin convention's job (``_CHANGED_PIN_KEYS`` in
``__spark_entry__``).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import textwrap
from collections.abc import Callable, Mapping
from pathlib import Path

MANIFEST_PATH = (
    Path(__file__).resolve().parent.parent / "KEY_SOURCE_MANIFEST.json"
)


def _source_or_token(obj) -> str:
    """getsource, or a stable identity token for unsourceable callables
    — the sink-grain lint (test_plans.py) separately guarantees every
    registered key IS a plain sourceable package function, so the token
    branch only matters for forward robustness."""
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return (
            "<unsourceable:"
            f"{getattr(obj, '__module__', '')}."
            f"{getattr(obj, '__qualname__', repr(type(obj)))}>"
        )


def _called_package_callables(fn: Callable) -> list[tuple[str, object]]:
    """Same-package callables (functions, processor classes) that
    ``fn``'s source invokes by bare name — sorted for hash determinism.
    One level: the helpers' own callees are not followed."""
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return []
    names = sorted(
        {
            node.func.id
            for node in ast.walk(tree)
            if isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
        }
    )
    out = []
    pkg = __name__.split(".", 1)[0]
    for name in names:
        obj = getattr(fn, "__globals__", {}).get(name)
        if obj is None or not callable(obj):
            continue
        mod = getattr(inspect.getmodule(obj), "__name__", "")
        if mod.startswith(pkg):
            out.append((name, obj))
    return out


def key_source_hash(fn: Callable, oracle: str) -> str:
    """sha256 over the function's source + its oracle SQL + the source
    of every same-package callable it invokes by bare name (see the
    module docstring for the granularity rationale)."""
    h = hashlib.sha256()
    h.update(_source_or_token(fn).encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    for name, obj in _called_package_callables(fn):
        h.update(b"\x00")
        h.update(name.encode())
        h.update(b"\x00")
        h.update(_source_or_token(obj).encode())
    return h.hexdigest()


def compute_key_source_hashes(
    queries: Mapping[str, Callable] | None = None,
    oracles: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """Current {key: source hash} over the live registry."""
    if queries is None:
        from mapreduce_6_824_lab1_spark import ORACLES, QUERIES

        queries, oracles = QUERIES, ORACLES
    oracles = oracles or {}
    return {
        k: key_source_hash(fn, oracles.get(k, ""))
        for k, fn in queries.items()
    }


def load_manifest() -> dict:
    """The committed manifest, or {} when absent/unreadable (the changed
    tier then contributes nothing — rotation degrades to r08 behavior)."""
    try:
        data = json.loads(MANIFEST_PATH.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def changed_keys() -> set[str]:
    """Registry keys whose current source hash differs from the manifest
    snapshot. Keys absent from the manifest are NOT changed — they are
    new registrations, which the rotation's fresh tier already leads
    with; deleted keys linger harmlessly in the manifest until the next
    refresh."""
    recorded = load_manifest().get("keys", {})
    if not isinstance(recorded, dict) or not recorded:
        return set()
    current = compute_key_source_hashes()
    return {
        k
        for k, h in current.items()
        if k in recorded and recorded[k] != h
    }
