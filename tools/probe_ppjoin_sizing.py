"""PPJoin prefix-filter sizing for jaccard_pairs (round 15, VERDICT r14
ask #1) — DuckDB-counted volumes, no Spark needed.

Question: would a PPJoin-style positional prefix filter (emit only the
first k - ceil(t*n) + 1 shingles of each doc's kept set, in global
ascending-document-frequency order, as candidate generators; verify
candidates against the full kept sets) beat the shipped counting
formulation (emit every shared kept shingle, count per pair, filter)?

MEASURED DEAD-END at sf0.1 (this tool):
- shipped counting form, with the r14 length filter: 822,468 pair rows
  shuffled into the common-count aggregate; 256 true result pairs.
- prefix filter: 204,116 emitted pair rows (-75%) BUT 193,340 distinct
  candidates — 755x the true pairs (the fixture's shingle vocabulary is
  small relative to doc count, so near-length docs collide on one
  semi-rare prefix shingle constantly).
- adding PPJoin's positional upper bound (1 + min(kx-rx, ky-ry) >=
  ceil(t*max(nx,ny))) still leaves 121,498 candidates, and the verify
  pass must intersect kept sets summing ~17.5M array elements — 21x the
  row volume the counting form shuffles, plus two extra joins carrying
  full shingle arrays.

The counting architecture is strictly better on this data shape at every
scale where the vocabulary/doc-count ratio holds: prefix filtering pays
off when candidates are rare (large vocabularies, high thresholds), and
its verify cost is the quadratic term here. Recorded as the measured
dead-end VERDICT r14 explicitly allowed.

Usage: python tools/probe_ppjoin_sizing.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

SH = (
    "list_transform(range(0, len(string_split(text, ' ')) - 2), "
    "i -> string_split(text, ' ')[i+1] || ' ' || "
    "string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3])"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t, cap = 0.6, 1000
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        f"""
CREATE TEMP TABLE sh AS
  SELECT DISTINCT doc_id, unnest({SH}) AS shingle FROM documents;
CREATE TEMP TABLE sizes AS
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id;
CREATE TEMP TABLE df AS
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle;
CREATE TEMP TABLE kept AS
  SELECT s.doc_id, s.shingle,
         row_number() OVER (
             PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS r,
         count(*) OVER (PARTITION BY s.doc_id) AS k
  FROM sh s JOIN df d ON s.shingle = d.shingle WHERE d.df <= {cap};
CREATE TEMP TABLE pfx AS
  SELECT kept.doc_id, shingle, r, k, n FROM kept JOIN sizes USING (doc_id)
  WHERE r <= k - ceil({t} * n - 1e-9) + 1;
"""
    )
    q = lambda sql: con.execute(sql).fetchone()[0]  # noqa: E731
    print("docs:", q("SELECT count(*) FROM sizes"))
    print(
        "shipped counting form pair rows (with r14 length filter):",
        q(
            f"""
SELECT count(*) FROM sh a
JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
JOIN df d ON a.shingle = d.shingle AND d.df <= {cap}
JOIN sizes sa ON a.doc_id = sa.doc_id
JOIN sizes sb ON b.doc_id = sb.doc_id
WHERE least(sa.n, sb.n) >= {t} * greatest(sa.n, sb.n) - 1e-9"""
        ),
    )
    print(
        "prefix-filter emitted pair rows:",
        q(
            f"""
SELECT count(*) FROM pfx a
JOIN pfx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
WHERE least(a.n, b.n) >= {t} * greatest(a.n, b.n) - 1e-9"""
        ),
    )
    print(
        "distinct candidates after prefix + length + positional bound:",
        q(
            f"""
SELECT count(*) FROM (
  SELECT DISTINCT a.doc_id, b.doc_id FROM pfx a
  JOIN pfx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE least(a.n, b.n) >= {t} * greatest(a.n, b.n) - 1e-9
    AND 1 + least(a.k - a.r, b.k - b.r)
        >= ceil({t} * greatest(a.n, b.n) - 1e-9))"""
        ),
    )
    print(
        "verify workload sum(kx+ky) over surviving candidates:",
        q(
            f"""
WITH cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.k AS ka, b.k AS kb
  FROM pfx a JOIN pfx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE least(a.n, b.n) >= {t} * greatest(a.n, b.n) - 1e-9
    AND 1 + least(a.k - a.r, b.k - b.r)
        >= ceil({t} * greatest(a.n, b.n) - 1e-9))
SELECT sum(ka + kb) FROM cand"""
        ),
    )
    print(
        "true result pairs:",
        q(
            f"""
WITH pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN df d ON a.shingle = d.shingle AND d.df <= {cap}
  GROUP BY 1, 2)
SELECT count(*) FROM pairs
JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
WHERE c * 1.0 / (sa.n + sb.n - c) >= {t}"""
        ),
    )


if __name__ == "__main__":
    main()
