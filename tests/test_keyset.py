"""Keyset (cursor) pagination — the seek method on the query facade.

The pin is EQUIVALENCE: a cursor walk must yield exactly the sequence
the (already oracle-pinned) offset walk yields under the same
order_by/where, page by page — typed ordering, null placement, and id
tiebreaks included. That cross-pins `_order_pieces`/`lexicographic_after`
against `compile_order_by` without sharing code (the sort side's plans
are byte-pinned elsewhere).
"""

from __future__ import annotations

import pytest

from sifts_spark.collection import Collection

# metadata exercising every typed-ordering class of the "auto" order:
# numbers (with a tie at 7), numeric-looking strings, plain strings,
# a missing key, and NULL metadata.
_DOCS = [
    ("d01", "alpha shared token one", {"k": 7, "g": "a"}),
    ("d02", "bravo shared token two", {"k": 7, "g": "b"}),
    ("d03", "charlie shared token three", {"k": 10, "g": "a"}),
    ("d04", "delta shared token four", {"k": 9, "g": "b"}),
    ("d05", "echo shared token five", {"k": 2.5, "g": "a"}),
    ("d06", "foxtrot shared token six", {"k": "10", "g": "b"}),
    ("d07", "golf shared token seven", {"k": "apple", "g": "a"}),
    ("d08", "hotel shared token eight", {"k": "Banana", "g": "b"}),
    ("d09", "india shared token nine", {"g": "a"}),  # k missing
    ("d10", "juliet shared token ten", None),  # NULL metadata
    ("d11", "kilo shared token eleven", {"k": -3, "g": "b"}),
    ("d12", "lima shared token twelve", {"k": 7.0, "g": "c"}),
]


@pytest.fixture()
def col(store_root, spark):
    c = Collection(store_root, "keyset", spark=spark)
    c.add(
        [t for _, t, _ in _DOCS],
        ids=[i for i, _, _ in _DOCS],
        metadatas=[m for _, _, m in _DOCS],
    )
    return c


def _offset_walk(col, page, **kw):
    out, off = [], 0
    while True:
        res = col.query(limit=page, offset=off, **kw)["results"]
        if not res:
            return out
        out.extend(res)
        off += page


def _cursor_walk(col, page, **kw):
    out, after = [], None
    for _ in range(50):  # hard stop — a broken predicate must not spin
        res = col.query(limit=page, after=after, **kw)["results"]
        if not res:
            return out
        out.extend(res)
        after = res[-1]
    raise AssertionError("cursor walk did not terminate")


@pytest.mark.parametrize(
    "order_by",
    ["k", "-k", ["g", "-k"], ["-g", "k"]],
    ids=["asc", "desc", "multi", "multi-rev"],
)
def test_cursor_walk_equals_offset_walk(col, order_by):
    for page in (3, 5):
        want = [r["id"] for r in _offset_walk(col, page, order_by=order_by)]
        got = [r["id"] for r in _cursor_walk(col, page, order_by=order_by)]
        assert got == want
        assert sorted(got) == sorted(i for i, _, _ in _DOCS)


def test_cursor_walk_with_where(col):
    kw = dict(order_by="-k", where={"g": {"$in": ["a", "b"]}})
    want = [r["id"] for r in _offset_walk(col, 3, **kw)]
    got = [r["id"] for r in _cursor_walk(col, 3, **kw)]
    # d10 (NULL metadata) and d12 (g="c") excluded — 10 of 12 match
    assert got == want and len(got) == 10


def test_cursor_walk_unordered_scan_is_id_ordered(col):
    # a plain scan's FIRST page keeps the legacy (storage-order) shape,
    # so an id-ordered walk starts from the documented empty-id cursor
    out, after = [], {"id": ""}
    for _ in range(10):
        res = col.query(limit=4, after=after)["results"]
        if not res:
            break
        out.extend(r["id"] for r in res)
        after = res[-1]
    assert out == sorted(i for i, _, _ in _DOCS)


def test_cursor_walk_search_rank_order(col):
    # every doc matches "shared token"; duplicate-grade BM25 ties are
    # broken by id — the walk must reproduce the offset pages exactly
    kw = dict(query_string="shared token")
    want = _offset_walk(col, 4, **kw)
    got = _cursor_walk(col, 4, **kw)
    assert [r["id"] for r in got] == [r["id"] for r in want]
    assert [r["rank"] for r in got] == pytest.approx(
        [r["rank"] for r in want]
    )


def test_cursor_total_is_full_match_count(col):
    first = col.query(limit=5, order_by="k")
    assert first["total"] == len(_DOCS)
    second = col.query(limit=5, order_by="k", after=first["results"][-1])
    assert second["total"] == len(_DOCS)  # PG total: pre-cursor count
    # walking past the end: empty page reports total=0 (PG semantics)
    tail = col.query(limit=50, order_by="k", after=first["results"][-1])
    done = col.query(limit=5, order_by="k", after=tail["results"][-1])
    assert done["results"] == [] and done["total"] == 0


def test_cursor_query_df_lazy_page(col):
    first = col.query_df(limit=4, order_by="k")
    rows = first.collect()
    rest = col.query_df(order_by="k", after={
        "id": rows[-1]["id"], "metadata": rows[-1]["metadata"],
    })
    assert rest.count() == len(_DOCS) - 4


def test_cursor_validation(col):
    with pytest.raises(ValueError, match="mutually exclusive"):
        col.query(limit=3, offset=3, after={"id": "d01"}, order_by="k")
    with pytest.raises(ValueError, match="at minimum"):
        col.query(limit=3, after={"metadata": {"k": 1}}, order_by="k")
    with pytest.raises(ValueError, match="metadata"):
        col.query(limit=3, after={"id": "d01", "metadata": 7}, order_by="k")
    # a ranked-search cursor without 'rank' would compile as a
    # rank-NULL cursor (sorts after every ranked row → silently empty
    # pages); it must refuse instead (ADVICE r12).
    with pytest.raises(ValueError, match="requires the cursor"):
        col.query("shared", limit=3, after={"id": "d01"})


def test_cursor_page_plan_is_top_k_not_global_sort(col, spark):
    """The scale claim itself: a cursor page with a limit plans as
    filter + TakeOrderedAndProject (page-sized per-partition heaps),
    never a global Sort/Exchange for the page."""
    first = col.query(limit=3, order_by="k")
    df = col.query_df(limit=3, order_by="k", after=first["results"][-1])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # the store's newest-batch-wins resolution sorts WITHIN partitions
    # ("Sort [...], false, 0") — what must never appear for a page is a
    # GLOBAL sort (range-partitioning exchange)
    assert "Exchange rangepartitioning" not in plan, plan
