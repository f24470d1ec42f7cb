"""asof_join / duplicate_clusters / sampling operator semantics.

Value-level parity with DuckDB is pinned by the catalog oracle entries
(events_asof, dedup_clusters, sample_stratified, topk_per_group);
these tests pin edge semantics on tiny hand-built inputs.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sifts_spark.operators.dedup import duplicate_clusters
from sifts_spark.operators.relational import asof_join
from sifts_spark.operators.sampling import stratified_sample, topk_per_group


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_match(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),  # before any right -> NULL
            (2, 100, _ts("2024-01-01T12:00:00")),  # exact-ts right row matches
            (3, 100, _ts("2024-01-01T13:30:00")),  # most recent = 12:00
            (4, 200, _ts("2024-01-01T12:30:00")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T12:00:00"), 5.0),
            (100, _ts("2024-01-01T14:00:00"), 7.0),
            (200, _ts("2024-01-01T11:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["r_ts"], r["r_value"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01T12:00:00"), 5.0)  # inclusive
    assert out[3] == (_ts("2024-01-01T12:00:00"), 5.0)  # not 14:00
    assert out[4] == (_ts("2024-01-01T11:00:00"), 9.0)
    # all left rows survive (left-join semantics)
    assert len(out) == 4


def test_duplicate_clusters_transitive_chain(spark):
    # chain 1-2, 2-3 (1 and 3 never paired directly) + isolated 4, 5-6
    verts = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(verts, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_stratified_sample_deterministic_and_exact(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(90)], "id long, grp string"
    )
    a = {(r["id"], r["grp"]) for r in stratified_sample(df, "grp", 5, "id").collect()}
    # repartitioning must not change the draw
    b = {
        (r["id"], r["grp"])
        for r in stratified_sample(df.repartition(7), "grp", 5, "id").collect()
    }
    assert a == b
    assert len(a) == 15
    small = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert stratified_sample(small, "grp", 5, "id").count() == 2


def test_topk_per_group_rank_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "a", 5), (4, "b", 1)],
        "id long, grp string, v long",
    )
    got = {
        (r["grp"], r["rank"]): r["id"]
        for r in topk_per_group(df, "grp", "v", 2, "id").collect()
    }
    # tie on v=10 broken by id asc
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 1): 4}


def test_salted_join_equals_plain_join(spark):
    """Salting is invisible in the result: same rows as the plain join,
    no _salt column leaks, left rows with unmatched keys drop (inner)."""
    from sifts_spark.operators.relational import salted_join

    probe = spark.createDataFrame(
        [(i, "hot" if i % 10 != 9 else f"cold{i}") for i in range(200)],
        "id INT, k STRING",
    )
    build = spark.createDataFrame(
        [("hot", 1.0)] + [(f"cold{i}", float(i)) for i in range(9, 200, 10)],
        "k STRING, v DOUBLE",
    )
    got = salted_join(probe, build, on="k", salt_buckets=4)
    assert "_salt" not in got.columns
    expected = probe.join(build, "k")
    assert got.count() == expected.count() == 200
    assert got.subtract(expected).count() == 0
    assert expected.subtract(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """A hot key's probe rows scatter across salt buckets (row-dependent
    hash, not key-dependent — key-hash salting would re-concentrate the
    hot key in one bucket)."""
    from pyspark.sql import functions as F

    S = 8
    probe = spark.range(1000).select(F.lit("hot").alias("k"), F.col("id"))
    salted = probe.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(S))
    )
    per_bucket = salted.groupBy("_salt").count().collect()
    assert len(per_bucket) == S  # all buckets used
    assert max(r["count"] for r in per_bucket) < 1000 * 0.5  # spread, not one bucket


def test_duplicate_clusters_distributed_path_matches_unionfind(spark):
    """Force the iterative propagation (driver_threshold=0) and check
    it produces exactly the union-find short-circuit's labeling."""
    from sifts_spark.operators.dedup import duplicate_clusters

    verts = spark.createDataFrame([(str(i),) for i in range(20)], "id STRING")
    pairs = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"),   # chain -> min 1
         ("7", "9"), ("9", "8"),               # triangle-ish -> min 7
         ("15", "16")],
        "id_a STRING, id_b STRING",
    )
    fast = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(verts, pairs, id_col="id").collect()
    }
    slow = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            verts, pairs, id_col="id", driver_threshold=0
        ).collect()
    }
    assert fast == slow
    assert fast["4"] == "1" and fast["8"] == "7" and fast["16"] == "15"
    assert fast["0"] == "0"  # singleton labels itself


def test_duplicate_clusters_threshold_boundary_inclusive(spark):
    """The branch probe is ``count <= driver_threshold`` — INCLUSIVE at
    exactly-threshold (r17 rewrote the probe from limit-collect to a
    count on the shared checkpoint; this pins the boundary either way).
    6 undirected pairs -> 12 directed distinct edges: threshold=12 must
    take the driver branch, 11 the distributed one, values identical."""
    from sifts_spark.operators.dedup import duplicate_clusters

    verts = spark.createDataFrame([(str(i),) for i in range(20)], "id STRING")
    pairs = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"),
         ("7", "9"), ("9", "8"),
         ("15", "16")],
        "id_a STRING, id_b STRING",
    )
    at = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            verts, pairs, id_col="id", driver_threshold=12
        ).collect()
    }
    under = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            verts, pairs, id_col="id", driver_threshold=11
        ).collect()
    }
    assert at == under
    assert at["4"] == "1" and at["8"] == "7" and at["16"] == "15"


# ---------------------------------------------------------------------
# De-registered catalog entries (the driver checks only 50 entries, so
# docs_intersect / events_rollup ceded their rows to docs_except /
# events_cube). Their DuckDB-oracle parity is pinned HERE instead, with
# the same SQL twins they had as driver entries.
# ---------------------------------------------------------------------

_SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{_SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def test_docs_intersect_matches_oracle(spark):
    from sifts_spark.plans.catalog import docs_intersect

    got = sorted(
        r.doc_id for r in docs_intersect(spark, _SF_DIR).collect()
    )
    want = sorted(
        _duck(
            "SELECT doc_id FROM documents WHERE lang = 'en' "
            "INTERSECT SELECT doc_id FROM documents WHERE n_chars > 200"
        )["doc_id"].tolist()
    )
    assert got == want and len(got) > 0


def test_events_rollup_matches_oracle(spark):
    from sifts_spark.plans.catalog import events_rollup

    got = {
        (r.event_type, r.hour_of_day): (r.n, round(r.sum_value, 6))
        for r in events_rollup(spark, _SF_DIR).collect()
    }
    odf = _duck(
        "SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hour_of_day, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY ROLLUP (event_type, extract(hour FROM ts))"
    )
    want = {}
    for _, r in odf.iterrows():
        et = None if r.event_type != r.event_type else r.event_type  # NaN -> None
        hod = None if r.hour_of_day != r.hour_of_day else int(r.hour_of_day)
        want[(et, hod)] = (int(r.n), round(float(r.sum_value), 6))
    assert got == want


def test_group_count_matches_oracle(spark):
    # de-registered in r10 (row ceded to top_ngrams); original SQL twin
    from sifts_spark.plans.catalog import group_count

    got = {
        r.source: (r.n_docs, round(r.avg_chars, 6))
        for r in group_count(spark, _SF_DIR).collect()
    }
    odf = _duck(
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "round(avg(n_chars), 6) AS avg_chars FROM documents GROUP BY source"
    )
    want = {
        r.source: (r.n_docs, round(r.avg_chars, 6)) for _, r in odf.iterrows()
    }
    assert got == want and len(got) > 3


def test_events_pivot_matches_dotpivot_formulation(spark):
    """Independent-formulation pin for events_pivot (r17 ADVICE): the
    registered DuckDB oracle is written as the SAME conditional
    aggregates the r17 rewrite uses, so the driver gate no longer
    cross-checks two formulations. Compare the shipped frame against
    Spark's own ``.pivot(col, values)`` path (PivotFirst — a genuinely
    different physical aggregation) on the real sf0.001 events table."""
    from pyspark.sql import functions as F

    from sifts_spark.plans.catalog import events_pivot
    from sifts_spark.sources.tables import load_table

    got = {
        r.day: (r.click, r.purchase, r.view)
        for r in events_pivot(spark, _SF_DIR).collect()
    }
    ev = load_table(spark, _SF_DIR, "events")
    piv = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
    )
    want = {r.day: (r.click, r.purchase, r.view) for r in piv.collect()}
    assert got == want and len(got) > 3
