"""Generate a replicated scale factor from an existing testdata dir.

Usage: python tools/make_scale.py [factor] [src_dir] [out_dir]
       (defaults: 10, /root/testdata/sf0.1, <repo>/.scale/sf1)

Methodology (recorded for SURVEY §6.1's two-scale bench): every fact
table is unioned ``factor`` times with per-replica key offsets large
enough to keep key spaces disjoint, foreign keys remapped consistently
(orders→customer, lineitem→orders/part/supplier, events→users), and
dimension tables (region, nation) left alone — the same shape TPC-H
scaling has. Document text gets a per-replica suffix token so the
near-dup operators see a 10× corpus, not 10 identical copies of one
corpus (which would quadratically inflate candidate pairs and measure
a different workload). Embeddings are replicated verbatim (ids remapped)
— duplicate-heavy corpora are exactly what the embedding-dedup
operators exist for.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000  # > every key in any source table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scale", "sf1")
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW reps AS SELECT unnest(generate_series(0, {factor - 1})) AS r")

    def emit(name: str, select: str) -> None:
        path = os.path.join(out, f"{name}.parquet")
        con.sql(
            f"COPY ({select}) TO '{path}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{name}: {n} rows")

    t = lambda name: f"'{src}/{name}.parquet'"

    # dimensions: verbatim
    for dim in ("region", "nation"):
        emit(dim, f"SELECT * FROM {t(dim)}")

    emit("customer", f"""
        SELECT c_custkey + r*{OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {t('customer')}, reps""")
    emit("supplier", f"""
        SELECT s_suppkey + r*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {t('supplier')}, reps""")
    emit("part", f"""
        SELECT p_partkey + r*{OFF} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {t('part')}, reps""")
    emit("orders", f"""
        SELECT o_orderkey + r*{OFF} AS o_orderkey,
               o_custkey + r*{OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, reps""")
    emit("lineitem", f"""
        SELECT l_orderkey + r*{OFF} AS l_orderkey,
               l_partkey + r*{OFF} AS l_partkey,
               l_suppkey + r*{OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, reps""")
    emit("events", f"""
        SELECT event_id + r*{OFF} AS event_id, ts,
               user_id + r*{OFF} AS user_id, event_type, value, props
        FROM {t('events')}, reps""")
    emit("documents", f"""
        SELECT doc_id + r*{OFF} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END AS text,
               lang, source,
               n_chars + CASE WHEN r = 0 THEN 0 ELSE len(' rep' || r) END AS n_chars
        FROM {t('documents')}, reps""")
    emit("embeddings", f"""
        SELECT vec_id + r*{OFF} AS vec_id, embedding, label
        FROM {t('embeddings')}, reps""")


if __name__ == "__main__":
    main()
