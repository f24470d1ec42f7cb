"""Differential property test: compile_where vs a pure-Python model of
the reference's documented semantics (core.py:228-300 — typed per
literal, SQL-NULL $in/$nin, conjunctive fold).

One docs DataFrame is built per session; each hypothesis example only
compiles a predicate and filters — no per-example session cost.
"""

from __future__ import annotations

import json

import pytest

try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from pyspark.sql import functions as F

from sifts_spark.functions.metadata import compile_where

WORDS = ["alpha", "beta", "gamma", "10", "x"]
KEYS = ["k1", "k2"]

# corpus: every combination shape that matters — missing keys, null
# metadata, numeric and string values, numeric-looking strings
METAS = (
    [None]
    + [{"k1": i} for i in range(-2, 3)]
    + [{"k1": w} for w in WORDS]
    + [{"k2": i} for i in (-1, 0, 7)]
    + [{"k1": i, "k2": w} for i in (0, 1) for w in WORDS[:3]]
    + [{"k2": "beta"}, {"k1": 2, "k2": 2}]
)


def _extract(meta, key):
    """get_json_object twin: scalar -> its JSON token string, else None."""
    if meta is None or key not in meta:
        return None
    v = meta[key]
    return str(v) if not isinstance(v, str) else v


def _num(s):
    try:
        return float(s) if s is not None else None
    except ValueError:
        return None


def _clause(ext, op, value):
    if op in ("$in", "$nin"):
        if ext is None:
            return False  # SQL NULL matches neither $in nor $nin
        def _elem(v):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                n = _num(ext)
                return n is not None and n == float(v)
            return ext == v
        any_m = any(_elem(v) for v in value)
        return any_m if op == "$in" else not any_m
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        x, lit = _num(ext), float(value)
    else:
        x, lit = ext, value
    if x is None:
        return False
    return {
        "$eq": x == lit,
        "$gt": x > lit,
        "$lt": x < lit,
        "$gte": x >= lit,
        "$lte": x <= lit,
    }[op]


def _model(meta, where):
    for key, spec in where.items():
        ext = _extract(meta, key)
        if not isinstance(spec, dict):
            if not _clause(ext, "$eq", spec):
                return False
        else:
            for op, value in spec.items():
                if not _clause(ext, op, value):
                    return False
    return True


if HAVE_HYP:
    _scalar = st.one_of(
        st.integers(-3, 3),
        st.sampled_from(WORDS),
    )
    _spec = st.one_of(
        _scalar,
        st.dictionaries(
            st.sampled_from(["$eq", "$gt", "$lt", "$gte", "$lte"]),
            _scalar,
            min_size=1,
            max_size=2,
        ),
        st.dictionaries(
            st.sampled_from(["$in", "$nin"]),
            st.lists(_scalar, min_size=0, max_size=3),
            min_size=1,
            max_size=1,
        ),
    )
    _where = st.dictionaries(st.sampled_from(KEYS), _spec, min_size=1, max_size=2)

    @pytest.fixture(scope="module")
    def meta_df(spark):
        rows = [(i, json.dumps(m) if m is not None else None) for i, m in enumerate(METAS)]
        return spark.createDataFrame(rows, "id INT, metadata STRING").cache()

    @given(where=_where)
    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_compile_where_matches_reference_model(meta_df, where):
        got = {
            r["id"]
            for r in meta_df.filter(compile_where(F.col("metadata"), where)).collect()
        }
        want = {i for i, m in enumerate(METAS) if _model(m, where)}
        assert got == want, f"where={where!r}: spark={sorted(got)} model={sorted(want)}"


# ---------------- order_by "auto" typed ordering vs SQLite type-order model


def _sqlite_sort_key(meta, key):
    """SQLite json_extract typed ordering (core.py:426-430): NULL,
    then numbers (numeric order), then strings (lexicographic) —
    with the documented caveat that numeric-looking JSON strings are
    indistinguishable from numbers after extraction."""
    ext = _extract(meta, key)
    if ext is None:
        return (2, 0, "")  # missing -> last ascending (nulls last)
    n = _num(ext)
    if n is not None:
        return (0, n, "")
    return (1, 0, ext)


if HAVE_HYP:

    @given(
        key=st.sampled_from(KEYS),
        desc=st.booleans(),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_order_by_auto_matches_sqlite_type_order(meta_df, key, desc):
        from sifts_spark.functions.metadata import compile_order_by

        cols = compile_order_by(
            F.col("metadata"), ("-" if desc else "") + key, numeric="auto"
        )
        got = [r["id"] for r in meta_df.orderBy(*cols, F.col("id")).collect()]
        idx = list(range(len(METAS)))
        if desc:
            # DESC: full reversal of the ascending typed key, ties by id
            # asc. Two stable sorts: id-asc base order, then reverse=True
            # on the typed key preserves id-asc within equal keys. (An
            # order-negating character transform like tuple(-ord(c)) would
            # mis-order prefix pairs: 'a' before 'ab' descending.)
            want = sorted(
                sorted(idx),
                key=lambda i: _sqlite_sort_key(METAS[i], key),
                reverse=True,
            )
        else:
            want = sorted(idx, key=lambda i: _sqlite_sort_key(METAS[i], key) + (i,))
        assert got == want, f"key={key} desc={desc}\n got={got}\nwant={want}"


