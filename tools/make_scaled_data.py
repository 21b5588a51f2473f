"""Deterministic scale-up replicator: sf0.1 -> sf1 / sf10 (10x / 100x rows).

The driver ships sf{0.001,0.01,0.1}; the largest is 600k lineitem rows.
That verifies correctness but cannot distinguish a linear plan from a
quadratic one hiding under fixed costs. This tool manufactures larger
scale factors from sf0.1 by key-offset replication so the SAME queries
can be swept at 10x and 100x rows (tools/scaling_sweep.py) and the
per-10x cost ratio measured empirically.

Replication model (replica r of K, all deterministic, no RNG):

* ``region``/``nation`` -- fixed dimensions, copied once (TPC-H holds
  them constant across SF).
* ``customer``/``supplier``/``part``/``orders``/``lineitem`` -- surrogate
  keys offset by ``r * stride(table)`` with every foreign key offset by
  the SAME stride, so each replica is a self-consistent star and joins
  produce exactly K x the sf0.1 matches (the TPC-H model: fact AND
  dimension cardinality grow with SF, per-key group sizes stay flat).
  Dates/amounts are left as-is: a fixed date range with K x density per
  day is how a bigger business looks.
* ``events`` -- event_id and user_id offset: K x users, per-user
  session shapes unchanged (sessionization work scales linearly, not
  via artificially K-x-longer per-user timelines).
* ``documents`` -- doc_id offset; for r > 0 every whitespace token gets
  a short per-replica suffix. Verbatim replication would make every doc
  an exact near-dup of K-1 clones and every shingle's posting list K x
  longer -- pair generation would then scale as K^2 by construction and
  the sweep would measure the synthetic clone pathology, not the plan.
  Salting keeps cross-replica Jaccard at ~0 so near-dup work scales
  with corpus size exactly as independent content does.
* ``embeddings`` -- vec_id offset; for r > 0 each vector is rotated by
  a per-replica deterministic sign-flip + coordinate roll (norm
  preserved). Identical clones would put K copies in every LSH bucket
  and turn kNN into a clone-finder; sign-flipped rolls decorrelate
  replicas while keeping the magnitude distribution identical.

Usage (from repo root; writes under scaled_data/, which is gitignored):
    python tools/make_scaled_data.py 10          # -> scaled_data/sf1
    python tools/make_scaled_data.py 100         # -> scaled_data/sf10
"""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scaled_data")

# Key strides: comfortably above the max key in sf0.1 so replica key
# ranges never overlap, and round so offsets are eyeball-able.
STRIDE = {
    "customer": 1_000_000,
    "supplier": 1_000_000,
    "part": 1_000_000,
    "orders": 10_000_000,
    "events": 10_000_000,
    "user": 1_000_000,
    "documents": 1_000_000,
    "embeddings": 1_000_000,
}


def _copy_fixed(con, out_dir: str, table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
        f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)"
    )


def _replicate_sql(con, out_dir: str, table: str, select_tpl: str, k: int) -> None:
    """Union K replicas of `select_tpl` (uses {r} for the replica index)."""
    parts = " UNION ALL ".join(select_tpl.format(r=r) for r in range(k))
    con.execute(
        f"COPY ({parts}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
    )


def _replicate_embeddings(out_dir: str, k: int) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    n, d = emb.shape
    chunks = []
    for r in range(k):
        e = emb
        if r > 0:
            # Deterministic per-replica decorrelation, norm-preserving:
            # roll coordinates by r (mod d) then flip signs on a
            # replica-dependent fixed mask.
            e = np.roll(emb, r % d, axis=1).copy()
            flip = (((np.arange(d) * 2654435761 + r * 40503) >> 3) & 1).astype(bool)
            e[:, flip] *= -1.0
        chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + r * STRIDE["embeddings"], pa.int64()),
                    "embedding": pa.array(list(e), pa.list_(pa.float32())),
                    "label": pa.array(label, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(chunks), f"{out_dir}/embeddings.parquet")


def make(k: int) -> str:
    assert k >= 1
    out_dir = os.path.join(OUT_ROOT, f"sf{k * 0.1:g}")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    _copy_fixed(con, out_dir, "region")
    _copy_fixed(con, out_dir, "nation")

    _replicate_sql(
        con, out_dir, "customer",
        "SELECT c_custkey + {r} * " + str(STRIDE["customer"]) + " AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM '{SRC}/customer.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "supplier",
        "SELECT s_suppkey + {r} * " + str(STRIDE["supplier"]) + " AS s_suppkey, "
        "s_name, s_nationkey, s_acctbal "
        f"FROM '{SRC}/supplier.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "part",
        "SELECT p_partkey + {r} * " + str(STRIDE["part"]) + " AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice "
        f"FROM '{SRC}/part.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "orders",
        "SELECT o_orderkey + {r} * " + str(STRIDE["orders"]) + " AS o_orderkey, "
        "o_custkey + {r} * " + str(STRIDE["customer"]) + " AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{SRC}/orders.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "lineitem",
        "SELECT l_orderkey + {r} * " + str(STRIDE["orders"]) + " AS l_orderkey, "
        "l_partkey + {r} * " + str(STRIDE["part"]) + " AS l_partkey, "
        "l_suppkey + {r} * " + str(STRIDE["supplier"]) + " AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SRC}/lineitem.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "events",
        "SELECT event_id + {r} * " + str(STRIDE["events"]) + " AS event_id, "
        "ts, user_id + {r} * " + str(STRIDE["user"]) + " AS user_id, "
        "event_type, value, props "
        f"FROM '{SRC}/events.parquet'",
        k,
    )
    _replicate_sql(
        con, out_dir, "documents",
        "SELECT doc_id + {r} * " + str(STRIDE["documents"]) + " AS doc_id, "
        "CASE WHEN {r} = 0 THEN text ELSE "
        r"regexp_replace(text, '(\S+)', '\1x{r}', 'g') END AS text, "
        "lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet'",
        k,
    )
    _replicate_embeddings(out_dir, k)
    con.close()
    return out_dir


if __name__ == "__main__":
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = make(mult)
    con = duckdb.connect()
    for tbl in ("lineitem", "events", "documents", "embeddings"):
        cnt = con.execute(f"SELECT count(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {cnt}")
    print(out)
