"""Relational operators Spark lacks as built-ins, composed from
DataFrame primitives (no UDFs, no per-row Python).

The headline is :func:`asof_join` — the time-series "most recent match"
join (DuckDB/QuestDB/pandas ``merge_asof`` semantics; kdb+ ``aj``).
Spark has no ASOF JOIN; the classic scalable rewrite is union-tag +
per-key ordered window with ``last(ignorenulls)``:

* a naive range join ``l.ts >= r.ts`` is O(|L|·|R|) per key before the
  "most recent" filter — a scale-killer;
* this rewrite costs ONE shuffle of L∪R keyed by the join key, then a
  single ordered window pass — linear in |L|+|R|, skew-bounded by the
  key's own cardinality, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the (small) build side
    ``salt_buckets``× and scatter each probe row to one replica, so a
    hot key's probe rows spread over ``salt_buckets`` reducers instead
    of landing on one.

    The classic salting rewrite for when AQE's skew split can't help
    (e.g. the skew is in the *join* key of a shuffle join and one key
    alone exceeds an executor). Build-side cost is |build|×S rows —
    use only when build is dim-sized. Result is byte-identical to the
    plain join: the salt column never leaves this function.

    Only probe-side-preserving joins are supported: with ``right`` or
    ``full``, an unmatched build row would surface once PER SALT
    REPLICA (the explode duplicates it), silently multiplying rows.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; how={how!r} would "
            "duplicate unmatched build rows once per salt replica"
        )
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    # the salt must be ROW-dependent, not key-dependent: hashing only
    # the join key would send every row of the hot key to one bucket,
    # defeating the spread. Hashing the whole row is deterministic
    # (retry/resume-safe, unlike rand()) and scatters a hot key's rows
    # across all buckets as long as rows differ anywhere.
    salted_probe = probe.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(salt_buckets)),
    )
    return salted_probe.join(salted_build, [on, "_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``on`` key with ``right_ts <= left_ts`` (backward-inclusive, the
    DuckDB ``ASOF LEFT JOIN … ON l.ts >= r.ts`` semantics). Unmatched
    left rows keep NULLs.

    Determinism contract: if the right side has several rows at the
    same (key, ts), callers must pre-dedup to one (this function does
    not pick silently). Output = all left columns + ``prefix``-renamed
    right value columns + ``prefix + right_ts``.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    rv = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # _side orders right rows BEFORE left rows at equal ts, so an
    # exact-ts right row is visible to the left row (inclusive match).
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(rv.alias("x")).schema["x"].dataType.simpleString()
        ).alias("_rv"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("x")
            ).schema["x"].dataType.simpleString()
        ).alias("_l"),
        rv.alias("_rv"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return matched.select(*out_cols)
