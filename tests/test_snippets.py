"""Snippet extraction (make_snippet / query(highlight=True)):
window selection, marking, polarity, phrase runs, edges."""

from __future__ import annotations

from sifts_spark.functions.snippets import make_snippet, positive_leaves
from sifts_spark.queryparser import parse_query


class TestMakeSnippet:
    def test_marks_and_window(self):
        text = (
            "filler " * 30
            + "the target word sits here in context "
            + "filler " * 30
        ).strip()
        ast = parse_query("target context")
        snip = make_snippet(text, ast, window=8)
        assert "[target]" in snip and "[context]" in snip
        assert snip.startswith("…") and snip.endswith("…")
        assert "[filler]" not in snip
        # window is token-bounded, not the whole doc
        assert len(snip) < len(text) / 2

    def test_densest_window_wins(self):
        text = (
            "alpha spread "
            + "noise " * 40
            + "alpha alpha alpha clustered together"
        )
        snip = make_snippet(text, parse_query("alpha"), window=6)
        assert snip.count("[alpha]") == 3  # the cluster, not the loner

    def test_original_casing_preserved(self):
        snip = make_snippet(
            "Apples are GREAT", parse_query("apples great"), window=6
        )
        assert "[Apples]" in snip and "[GREAT]" in snip
        assert not snip.startswith("…") and not snip.endswith("…")

    def test_prefix_and_phrase_highlighting(self):
        text = "querying quick brown fox and quick red fox"
        snip = make_snippet(text, parse_query('quer* "quick brown"'), window=12)
        assert "[querying]" in snip
        assert "[quick] [brown]" in snip
        # the scattered second "quick" is not part of the phrase run
        assert "[quick] red" not in snip and " quick red" in snip

    def test_negated_terms_never_highlight(self):
        terms, prefixes, phrases, scans = positive_leaves(
            parse_query('apples NOT oranges')
        )
        assert terms == {"apples"}
        assert not prefixes and not phrases and not scans
        snip = make_snippet(
            "apples and oranges", parse_query("apples NOT bananas"), window=8
        )
        assert "[apples]" in snip and "[oranges]" not in snip

    def test_edges(self):
        ast = parse_query("x")
        assert make_snippet(None, ast) == ""
        assert make_snippet("", ast) == ""
        assert make_snippet("!!! ???", ast) == "!!! ???"
        # matchless text: plain leading window
        out = make_snippet("just some words here", ast, window=2)
        assert out == "just some…"


def test_query_highlight_end_to_end(store_root, spark):
    from sifts_spark.collection import Collection

    col = Collection(store_root, "hl", spark=spark)
    col.add(
        ["the quick brown fox jumps over fences",
         "nothing relevant in this one at all"],
        ids=["hit", "miss"],
    )
    res = col.query("quick fences", highlight=True)
    assert [r["id"] for r in res["results"]] == ["hit"]
    assert "[quick]" in res["results"][0]["snippet"]
    assert "[fences]" in res["results"][0]["snippet"]
    # off by default
    res2 = col.query("quick")
    assert "snippet" not in res2["results"][0]


def test_hybrid_query_highlight(store_root, spark):
    from sifts_spark.collection import Collection

    def embed(texts):
        return [[1.0, 0.0] if "quick" in t else [0.0, 1.0] for t in texts]

    col = Collection(store_root, "hh", spark=spark,
                     embedding_function=embed)
    col.add(
        ["the quick brown fox", "slow green turtle"], ids=["q", "s"]
    )
    res = col.hybrid_query("quick fox", k=2, highlight=True)
    by_id = {r["id"]: r for r in res["results"]}
    assert "[quick]" in by_id["q"]["snippet"]
    # vector-leg-only hit: unmarked window, still present
    assert "snippet" in by_id["s"] and "[" not in by_id["s"]["snippet"]


def test_query_df_snippet_column_matches_driver_path(store_root, spark):
    from sifts_spark.collection import Collection

    col = Collection(store_root, "hd", spark=spark)
    col.add(
        ["the quick brown fox jumps over fences " + "pad " * 30,
         "fences first then much later a quick appearance"],
        ids=["a", "b"],
    )
    page = col.query("quick fences", highlight=True)["results"]
    bulk = {
        r["id"]: r["snippet"]
        for r in col.query_df("quick fences", highlight=True).collect()
    }
    assert len(bulk) == 2
    for r in page:
        assert bulk[r["id"]] == r["snippet"]  # one kernel, two paths


def test_highlight_without_match_tokens_raises(store_root, spark):
    # r10 ADVICE: silently ignoring highlight=True on vector searches
    # and whitespace-only queries left the caller with no signal why
    # the snippet column was missing — both now raise (the
    # order_by/vector_search validation precedent)
    import pytest

    from sifts_spark.collection import Collection

    col = Collection(store_root, "ws", spark=spark,
                     embedding_function=lambda ts: [[1.0, 0.0] for _ in ts])
    col.add(["some text"], ids=["1"])
    with pytest.raises(ValueError, match="highlight.*vector_search"):
        col.query("some", vector_search=True, highlight=True)
    with pytest.raises(ValueError, match="highlight.*vector_search"):
        col.query_df("some", vector_search=True, highlight=True)
    with pytest.raises(ValueError, match="non-empty text query"):
        col.query("   ", highlight=True)
    with pytest.raises(ValueError, match="non-empty text query"):
        col.query_df("", highlight=True)
    # plain scans without highlight stay fine
    assert col.query("   ")["total"] == 1


def test_hybrid_query_df_highlight_matches_driver_path(store_root, spark):
    # r10 verdict item 6: the bulk fused path can now produce snippet
    # datasets; its rows must agree with hybrid_query(highlight=True)
    from sifts_spark.collection import Collection

    def embed(texts):
        return [[1.0, 0.0] if "quick" in t else [0.0, 1.0] for t in texts]

    col = Collection(store_root, "hhdf", spark=spark,
                     embedding_function=embed)
    col.add(
        ["the quick brown fox jumps fences", "slow green turtle sits"],
        ids=["q", "s"],
    )
    page = {r["id"]: r for r in
            col.hybrid_query("quick fox", k=2, highlight=True)["results"]}
    bulk = {r["id"]: r for r in
            col.hybrid_query_df("quick fox", k=2, highlight=True).collect()}
    assert set(bulk) == set(page) == {"q", "s"}
    for i in page:
        assert bulk[i]["snippet"] == page[i]["snippet"]
        assert abs(bulk[i]["rank"] - page[i]["rank"]) < 1e-9
    assert "[quick]" in bulk["q"]["snippet"]
    # off by default: no snippet column in the lazy schema
    assert "snippet" not in col.hybrid_query_df("quick fox", k=1).columns
