"""Exact-substring (duplicated-span) dedup — operators/substring.py.

Python-reference strategy (same as the repetition-stats family): the
winnowing guarantee and the span cut are checked against brute-force
token-level comparisons computed in plain Python on small corpora.
"""

import re

import pytest

from pyspark.sql import functions as F

from sifts_spark.operators.substring import (
    duplicate_spans,
    remove_duplicate_spans,
    winnow_fingerprints_arrow,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [f"w{i}" for i in range(200)]
SHARED = " ".join(WORDS[:30])  # a 30-token run shared verbatim


def _corpus(spark):
    uniq_a = " ".join(f"a{i}" for i in range(40))
    uniq_b = " ".join(f"b{i}" for i in range(40))
    uniq_c = " ".join(f"c{i}" for i in range(80))
    return _docs(
        spark,
        [
            (1, f"{uniq_a} {SHARED} tail one"),
            (2, f"intro two {SHARED} {uniq_b}"),
            (3, uniq_c),
        ],
    )


def test_shared_run_detected_and_first_kept(spark):
    # k + w - 1 = 10 + 5 - 1 = 14 <= 30 shared tokens -> guaranteed
    out = duplicate_spans(_corpus(spark), k=10, w=5).collect()
    by_id = {r["id"]: r for r in out}
    # doc 1 holds the corpus-wide first occurrence -> exempt
    assert 1 not in by_id
    assert 3 not in by_id  # unique text, no spans
    assert 2 in by_id
    r = by_id[2]
    assert r["n_spans"] == 1
    (span,) = r["spans"]
    text2 = "intro two " + SHARED + " " + " ".join(f"b{i}" for i in range(40))
    cut = text2[span["start"] : span["end"]]
    # the cut span lies inside the shared run (token-aligned, may not
    # cover the full 30 tokens when the first selected fingerprint
    # starts mid-run)
    assert cut in SHARED
    assert r["dup_chars"] == span["end"] - span["start"]


def test_keep_first_false_marks_every_copy(spark):
    out = duplicate_spans(_corpus(spark), k=10, w=5, keep_first=False).collect()
    ids = {r["id"] for r in out}
    assert ids == {1, 2}


def test_remove_spans_row_per_input_and_clean_docs_verbatim(spark):
    docs = _corpus(spark)
    out = remove_duplicate_spans(docs, k=10, w=5)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    # untouched docs pass through byte-identical
    assert rows[1]["text"] == orig[1] and rows[1]["removed_chars"] == 0
    assert rows[3]["text"] == orig[3] and rows[3]["n_spans_removed"] == 0
    # doc 2 lost exactly its duplicated chars, text stitched around them
    r2 = rows[2]
    assert r2["removed_chars"] > 0
    assert len(r2["text"]) == len(orig[2]) - r2["removed_chars"]
    assert r2["text"].startswith("intro two")
    assert r2["text"].endswith("b39")
    # nothing unique was lost
    for tok in ("intro", "two", "b0", "b39"):
        assert tok in r2["text"]


def test_within_doc_repeats(spark):
    body = " ".join(WORDS[50:70])
    docs = _docs(spark, [(7, f"{body} filler inner text {body}")])
    # cross-doc mode: nothing (only one doc)
    assert duplicate_spans(docs, k=8, w=4).count() == 0
    out = duplicate_spans(docs, k=8, w=4, within_doc=True).collect()
    assert len(out) == 1 and out[0]["id"] == 7
    (span,) = out[0]["spans"]
    # the second copy is the removable one
    assert span["start"] > len(body)


def test_short_docs_emit_no_fingerprints(spark):
    docs = _docs(spark, [(1, "only four tokens here"), (2, None), (3, "")])
    fps = docs.select(
        F.explode(winnow_fingerprints_arrow(F.col("text"), 10, 5)["fp"])
    )
    assert fps.count() == 0
    assert duplicate_spans(docs, k=10, w=5).count() == 0


def test_winnowing_guarantee_random_offsets(spark):
    # the shared run sits at DIFFERENT token offsets in each doc —
    # the content-defined selection must still fire in both
    shared = " ".join(f"s{i}" for i in range(25))  # 25 >= w+k-1 = 18
    rows = []
    for d in range(6):
        prefix = " ".join(f"p{d}x{j}" for j in range(d * 3 + 1))
        rows.append((d, f"{prefix} {shared} z{d}"))
    out = duplicate_spans(_docs(spark, rows), k=12, w=7, keep_first=False)
    assert {r["id"] for r in out.collect()} == set(range(6))


def test_fingerprints_deterministic_and_token_aligned(spark):
    docs = _docs(spark, [(1, "Alpha, beta; GAMMA delta epsilon zeta eta theta")])
    col = winnow_fingerprints_arrow(F.col("text"), 3, 2).alias("z")
    a = docs.select(col).collect()[0]["z"]
    b = docs.select(col).collect()[0]["z"]
    assert a == b
    assert len(a["fp"]) == len(a["start"]) == len(a["end"]) > 0
    text = docs.first()["text"]
    for s, e in zip(a["start"], a["end"]):
        frag = text[s:e]
        # spans start and end on token characters
        assert re.match(r"[A-Za-z0-9]", frag[0]) and re.match(
            r"[A-Za-z0-9]", frag[-1]
        )


def test_case_and_punct_insensitive_matching(spark):
    # same tokens, different case/punctuation -> same fingerprints
    run = " ".join(f"m{i}" for i in range(20))
    noisy = ", ".join(f"M{i}" for i in range(20)) + "!"
    docs = _docs(spark, [(1, f"{run} only one"), (2, f"zz {noisy}")])
    out = duplicate_spans(docs, k=10, w=5, keep_first=False).collect()
    assert {r["id"] for r in out} == {1, 2}


def test_exact_mode_covers_full_run(spark):
    # exact mode: the merged span covers the ENTIRE shared run, so the
    # cut text retains no fragment of it
    docs = _corpus(spark)
    out = remove_duplicate_spans(docs, k=10, w=5, mode="exact")
    rows = {r["id"]: r for r in out.collect()}
    # doc 1 (first occurrence) keeps the run verbatim
    assert SHARED in rows[1]["text"]
    # doc 2 loses every token of it
    for i in range(30):
        assert WORDS[i] not in rows[2]["text"].split()
    # the non-duplicated frame of doc 2 survives intact
    assert rows[2]["text"].startswith("intro two")
    assert "b0" in rows[2]["text"] and "b39" in rows[2]["text"]
    # detection floor drops to k tokens in exact mode
    short_run = " ".join(WORDS[100:112])  # 12 tokens, < w+k-1=14
    docs2 = _docs(
        spark,
        [(1, f"one {short_run} xx"), (2, f"zz {short_run} yy qq")],
    )
    exact = duplicate_spans(docs2, k=10, w=5, mode="exact", keep_first=False)
    assert {r["id"] for r in exact.collect()} == {1, 2}


def test_keep_first_overlapping_runs_each_keep_a_copy(spark):
    """r6 ADVICE / r8 VERDICT item 8: two duplicated runs OVERLAP in one
    doc and their corpus-wide first occurrences live in different docs.
    Without the overlap exemption, cutting d3's removable X+S interval
    destroys the protected prefix of run2's (S Y) first occurrence, and
    with d4 also fully cut, run2 survives NOWHERE. With the exemption,
    every run keeps >= 1 intact corpus-wide copy."""
    k = 5
    X = " ".join(f"x{i}" for i in range(8))
    S = " ".join(f"s{i}" for i in range(8))
    Y = " ".join(f"y{i}" for i in range(8))
    d1 = f"{X} {S}"            # first occurrence of run1 = X S
    d3 = f"{X} {S} {Y}"        # run1 (removable) overlaps run2 = S Y,
    d4 = f"{S} {Y}"            # whose first occurrence is d3
    docs = _docs(spark, [(1, d1), (3, d3), (4, d4)])
    out = {r["id"]: r["text"]
           for r in remove_duplicate_spans(docs, k=k, mode="exact").collect()}
    # run1 survives intact in d1 (all-protected there)
    assert f"{X} {S}" in out[1]
    # run2's first occurrence in d3 is NOT cut: the removable X+S
    # interval overlaps protected boundary grams -> exempted
    assert f"{S} {Y}" in out[3]
    # d4 holds no first occurrences; its duplicated run is fully cut
    assert S not in out[4] and Y not in out[4]
    # the absolute guarantee: every duplicated run keeps >= 1 copy
    for run in (f"{X} {S}", f"{S} {Y}"):
        assert any(run in t for t in out.values())


def test_mode_validation(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        duplicate_spans(docs, mode="bogus").collect()


# ------------------------- property tests (hypothesis) -------------------------

try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    # small token alphabet => real cross-doc k-gram collisions occur
    _doc_st = st.lists(
        st.sampled_from([f"t{i}" for i in range(12)]), min_size=0, max_size=40
    ).map(" ".join)
    _corpus_st = st.lists(_doc_st, min_size=1, max_size=8)

    @given(texts=_corpus_st, mode=st.sampled_from(["winnow", "exact"]))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_remove_spans_char_conservation(spark, texts, mode):
        """Invariants that must hold for ANY corpus, both modes:
        one output row per input doc, len(out) == len(in) −
        removed_chars, clean docs byte-identical, and every cut is
        token-aligned (no mid-token truncation: the output never holds
        MORE distinct alphabet tokens than the input)."""
        docs = _docs(spark, list(enumerate(texts)))
        out = {r["id"]: r for r in
               remove_duplicate_spans(docs, k=4, w=3, mode=mode).collect()}
        assert set(out) == set(range(len(texts)))
        for i, t in enumerate(texts):
            r = out[i]
            assert len(r["text"]) == len(t) - r["removed_chars"]
            if r["n_spans_removed"] == 0:
                assert r["text"] == t
            assert set(r["text"].split()) <= set(t.split()) | {""}
