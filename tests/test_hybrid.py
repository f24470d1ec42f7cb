"""Hybrid BM25+vector search with RRF fusion (facade extension).

Value-level oracle: the test recomputes RRF in plain Python from the
two single-leg query() results (which are themselves oracle-pinned
elsewhere) and demands identical ordering and scores.
"""

from __future__ import annotations

import pytest

from sifts_spark.collection import Collection

# text leg and vector leg deliberately DISAGREE: "baked fruit dessert"
# never matches the text query but is the closest vector; "apple apple
# pie apple" dominates BM25 but is vector-far.
_LOOKUP = {
    "apple pie recipe": [0.9, 0.1, 0.0],
    "apple apple pie apple": [0.0, 1.0, 0.0],
    "baked fruit dessert": [1.0, 0.0, 0.05],
    "orchard visit notes": [0.0, 0.0, 1.0],
    "apple": [1.0, 0.0, 0.0],  # the query string itself
}


def embed(texts):
    return [_LOOKUP[t] for t in texts]


@pytest.fixture()
def col(store_root, spark):
    c = Collection(store_root, "hyb", embedding_function=embed, spark=spark)
    c.add(list(k for k in _LOOKUP if k != "apple"),
          ids=["pie", "spam", "dessert", "orchard"],
          metadatas=[{"lang": "en"}, {"lang": "en"}, {"lang": "fr"}, {"lang": "en"}])
    return c


def _python_rrf(col, query, rrf_k=60, where=None):
    t = col.query(query, where=where)["results"]
    v = col.query(query, vector_search=True, where=where)["results"]
    scores: dict[str, float] = {}
    for leg in (t, v):
        for pos, r in enumerate(leg, start=1):
            scores[r["id"]] = scores.get(r["id"], 0.0) + 1.0 / (rrf_k + pos)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_hybrid_matches_python_rrf(col):
    got = col.hybrid_query("apple", k=10)
    want = _python_rrf(col, "apple")
    assert [r["id"] for r in got["results"]] == [i for i, _ in want]
    for r, (_, s) in zip(got["results"], want):
        assert r["rank"] == pytest.approx(s)
    assert got["total"] == len(want)
    # fusion is visible: the vector-only doc is present even though the
    # text leg never retrieves it, and neither leg's own order wins
    ids = [r["id"] for r in got["results"]]
    assert "dessert" in ids
    text_order = [r["id"] for r in col.query("apple")["results"]]
    vec_order = [r["id"] for r in col.query("apple", vector_search=True)["results"]]
    assert ids != text_order and ids != vec_order


def test_hybrid_where_filters_both_legs(col):
    got = col.hybrid_query("apple", where={"lang": "en"})
    assert [r["id"] for r in got["results"]] == [
        i for i, _ in _python_rrf(col, "apple", where={"lang": "en"})
    ]
    assert all(r["metadata"]["lang"] == "en" for r in got["results"])


def test_hybrid_k_and_weights(col):
    top1 = col.hybrid_query("apple", k=1)
    assert len(top1["results"]) == 1
    full = _python_rrf(col, "apple")
    assert top1["results"][0]["id"] == full[0][0]
    # all-weight-on-vector degenerates to the vector leg's order
    vec_only = col.hybrid_query("apple", weights=(0.0, 1.0))
    vec_order = [r["id"] for r in col.query("apple", vector_search=True)["results"]]
    assert [r["id"] for r in vec_only["results"]][: len(vec_order)] == vec_order


def test_hybrid_validations(store_root, spark):
    plain = Collection(store_root, "nofts", use_fts=False,
                       embedding_function=embed, spark=spark)
    plain.add(["apple pie recipe"], ids=["x"])
    with pytest.raises(ValueError, match="use_fts"):
        plain.hybrid_query("apple")
    noemb = Collection(store_root, "noemb", spark=spark)
    noemb.add(["apple pie recipe"], ids=["x"])
    with pytest.raises(ValueError, match="embedding_function"):
        noemb.hybrid_query("apple")
    c = Collection(store_root, "ok", embedding_function=embed, spark=spark)
    c.add(["apple pie recipe"], ids=["x"])
    with pytest.raises(ValueError, match="non-empty"):
        c.hybrid_query("   ")
    # r11 ADVICE: highlight=True with a whitespace-only query must
    # surface the SAME _validate_highlight ValueError as query/query_df
    # (not a downstream parser error) on both hybrid paths
    with pytest.raises(ValueError, match="highlight=True requires"):
        c.hybrid_query("   ", highlight=True)
    with pytest.raises(ValueError, match="highlight=True requires"):
        c.hybrid_query_df("   ", highlight=True)


def test_hybrid_query_df_matches_dict_variant(col):
    df = col.hybrid_query_df("apple", k=10)
    assert df.columns == ["id", "content", "metadata", "rank"]
    got = [(r["id"], r["rank"]) for r in df.collect()]
    want = [
        (r["id"], r["rank"]) for r in col.hybrid_query("apple", k=10)["results"]
    ]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b)


# ------------------------------------------------- hybrid + MMR (r10)

_MMR_LOOKUP = {
    "apple pie recipe": [1.0, 0.0, 0.0],
    "apple pie formula": [0.999, 0.04, 0.0],   # near-dup of the recipe
    "apple orchard walk": [0.0, 1.0, 0.0],     # relevant but diverse
    "pear tart notes": [0.0, 0.0, 1.0],
    "apple pie": [1.0, 0.01, 0.0],             # the query string
}


def _mmr_embed(texts):
    return [_MMR_LOOKUP[t] for t in texts]


@pytest.fixture()
def mmr_col(store_root, spark):
    c = Collection(store_root, "hyb_mmr", embedding_function=_mmr_embed,
                   spark=spark)
    c.add([k for k in _MMR_LOOKUP if k != "apple pie"],
          ids=["recipe", "formula", "orchard", "pear"])
    return c


def test_hybrid_mmr_displaces_near_duplicate(mmr_col):
    plain = mmr_col.hybrid_query("apple pie", k=3)
    plain_ids = [r["id"] for r in plain["results"]]
    # both legs rank the two near-dups on top
    assert set(plain_ids[:2]) == {"recipe", "formula"}

    mmr = mmr_col.hybrid_mmr_query("apple pie", k=3, lambda_=0.5)
    ids = [r["id"] for r in mmr["results"]]
    assert ids[0] == plain_ids[0]          # top pick = most relevant
    assert ids[1] not in {"recipe", "formula"} or ids[1] != plain_ids[1]
    # the near-dup of the winner is NOT second under diversification
    assert ids[1] in {"orchard", "pear"}
    assert [r["mmr_position"] for r in mmr["results"]] == [0, 1, 2]
    # rank stays the RRF score of that row in the plain fusion
    plain_rrf = {r["id"]: r["rank"] for r in plain["results"]}
    for r in mmr["results"]:
        if r["id"] in plain_rrf:
            assert r["rank"] == pytest.approx(plain_rrf[r["id"]])


def test_hybrid_mmr_lambda_one_is_fused_order(mmr_col):
    plain = [r["id"] for r in mmr_col.hybrid_query("apple pie", k=3)["results"]]
    mmr = [r["id"] for r in
           mmr_col.hybrid_mmr_query("apple pie", k=3, lambda_=1.0)["results"]]
    assert mmr == plain


def test_hybrid_mmr_validations(mmr_col):
    with pytest.raises(ValueError, match="lambda_"):
        mmr_col.hybrid_mmr_query("apple pie", lambda_=-0.1)
    with pytest.raises(ValueError, match="fetch_k"):
        mmr_col.hybrid_mmr_query("apple pie", k=5, fetch_k=2)


def test_hybrid_cursor_walk_equals_single_page(col):
    """after= keyset cursor over the fused order (rrf desc, id asc):
    walking page-by-page must reproduce the one-shot top-k exactly —
    same ids, same RRF scores — and total stays the full fused count."""
    full = col.hybrid_query("apple", k=10)
    want = [(r["id"], r["rank"]) for r in full["results"]]
    walked, after = [], None
    for _ in range(10):
        page = col.hybrid_query("apple", k=2, after=after)
        if not page["results"]:
            break
        assert page["total"] == full["total"]  # total-before-cursor
        walked.extend((r["id"], r["rank"]) for r in page["results"])
        after = page["results"][-1]
    else:
        raise AssertionError("cursor walk did not terminate")
    assert [(i, pytest.approx(s)) for i, s in want] == walked
    # df variant pages identically
    df_page = col.hybrid_query_df("apple", k=2, after=full["results"][1])
    assert [r["id"] for r in df_page.collect()] == [i for i, _ in want[2:4]]


def test_hybrid_cursor_validations(col):
    with pytest.raises(ValueError, match="hybrid after="):
        col.hybrid_query("apple", after={"id": "pie"})  # no rank
    with pytest.raises(ValueError, match="hybrid after="):
        col.hybrid_query("apple", after={"rank": 0.1})  # no id


# ------------------------------------------- MMR seek cursors (r14)


def test_mmr_cursor_walk_equals_single_selection(mmr_col):
    """after= on mmr_query: page-by-page walk reproduces the one-shot
    selection order exactly (ids, ranks, ABSOLUTE mmr_position) — the
    greedy is deterministic, so re-running it per page and slicing
    after the cursor is exact, not approximate."""
    walked, cursor = [], None
    for _ in range(4):
        page = mmr_col.mmr_query("apple pie", k=1, fetch_k=16,
                                 lambda_=0.5, after=cursor)
        if not page["results"]:
            break
        walked.extend(page["results"])
        cursor = {"id": page["results"][-1]["id"]}
    # one-shot with the same pool size for an apples-to-apples order
    single = mmr_col.mmr_query("apple pie", k=4, fetch_k=16, lambda_=0.5)
    assert [r["id"] for r in walked] == [r["id"] for r in single["results"]]
    assert [r["mmr_position"] for r in walked] == [0, 1, 2, 3]
    for a, b in zip(walked, single["results"]):
        assert a["rank"] == pytest.approx(b["rank"])


def test_hybrid_mmr_cursor_walk_equals_single_selection(mmr_col):
    single = mmr_col.hybrid_mmr_query("apple pie", k=4, fetch_k=16,
                                      lambda_=0.5)
    walked, cursor = [], None
    for _ in range(2):
        page = mmr_col.hybrid_mmr_query("apple pie", k=2, fetch_k=16,
                                        lambda_=0.5, after=cursor)
        walked.extend(page["results"])
        cursor = page["results"][-1]["id"]  # bare-string cursor form
    assert [r["id"] for r in walked] == [r["id"] for r in single["results"]]
    assert [r["mmr_position"] for r in walked] == [0, 1, 2, 3]


def test_mmr_stale_cursor_raises(mmr_col):
    with pytest.raises(ValueError, match="selection order"):
        mmr_col.mmr_query("apple pie", k=2, after={"id": "no-such-doc"})
    with pytest.raises(ValueError, match="after must be"):
        mmr_col.mmr_query("apple pie", k=2, after={"rank": 1.0})


def test_hybrid_substring_scan_text_leg(col):
    # r16: substring_scan threads through all three hybrid surfaces —
    # the text leg serves the Suffix leaf from the postings term
    # dictionary ('*ipe' → recipe), fused like any text hit
    from sifts_spark.queryparser import ParseError

    _LOOKUP["*ipe"] = [0.9, 0.05, 0.05]  # vector leg embeds the query
    with pytest.raises(ParseError, match="substring_scan"):
        col.hybrid_query("*ipe")
    r = col.hybrid_query("*ipe", substring_scan=True)
    ids = [x["id"] for x in r["results"]]
    assert ids[0] == "pie"  # only text hit; vector leg ranks the rest
    got = _python_rrf_substr(col)
    assert [x["id"] for x in r["results"]] == [i for i, _ in got]
    m = col.hybrid_mmr_query("*ipe", substring_scan=True, k=2)
    assert len(m["results"]) == 2
    df = col.hybrid_query_df("*ipe", substring_scan=True, highlight=True)
    assert "snippet" in df.columns


def _python_rrf_substr(col, rrf_k=60):
    t = col.query("*ipe", substring_scan=True)["results"]
    v = col.query("*ipe", vector_search=True)["results"]
    scores: dict[str, float] = {}
    for leg in (t, v):
        for pos, r in enumerate(leg, start=1):
            scores[r["id"]] = scores.get(r["id"], 0.0) + 1.0 / (rrf_k + pos)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
