"""Guard against the HUGEINT-oracle class of driver hash failures.

DuckDB promotes ``sum(BIGINT)`` (and sums of any integer type) to HUGEINT,
which surfaces as Arrow decimal128 / pandas float64 — while Spark returns
int64. The round driver's value hash then mismatches even when every value
is numerically identical (CORRECTNESS_r03: cdc_apply_latest). This suite
executes every registered oracle in DuckDB alone and asserts no output
column is a HUGEINT/DECIMAL type, so the fix (an outer ``CAST(... AS
BIGINT)``) can never silently regress."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mapreduce_6_824_lab1_spark import ORACLES

ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_emits_no_hugeint(key, duck):
    tbl = duck.execute(ORACLES[key]).arrow()
    bad = [
        f"{name}: {typ}"
        for name, typ in zip(tbl.schema.names, tbl.schema.types)
        if pa.types.is_decimal(typ)
    ]
    assert not bad, (
        f"oracle for {key!r} emits HUGEINT/DECIMAL columns {bad} — the "
        "driver hash compare will fail vs Spark's int64; wrap the aggregate "
        "in CAST(... AS BIGINT)"
    )
