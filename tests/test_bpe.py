"""BPE tokenizer — operators/bpe.py.

Checked against the algorithm's own invariants plus a brute-force
pair-count reference for the first merges (the naive recount the
incremental bookkeeping must agree with).
"""

import pytest

from pyspark.sql import functions as F

from sifts_spark.functions.artifacts import load_artifact, save_artifact
from sifts_spark.functions.hashing import _py_tokenize
from sifts_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_segment,
    bpe_token_count,
    train_bpe,
    _py_bpe_encode,
)


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new",
    "wider wide wide new low",
    "the lowest newest widest",
] * 3


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def _naive_top_pair(freqs):
    counts = {}
    for w, f in freqs.items():
        syms = list(w) + [EOW]
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + f
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def test_first_merge_matches_naive_reference(spark):
    model = train_bpe(_docs(spark), num_merges=1)
    freqs = {}
    for t in CORPUS:
        for tok in _py_tokenize(t):
            freqs[tok] = freqs.get(tok, 0) + 1
    assert tuple(model["merges"][0]) == _naive_top_pair(freqs)


def test_training_deterministic(spark):
    a = train_bpe(_docs(spark), num_merges=50)
    b = train_bpe(_docs(spark), num_merges=50)
    assert a["merges"] == b["merges"]


def test_encode_roundtrip_characters(spark):
    docs = _docs(spark)
    model = train_bpe(docs, num_merges=60)
    rows = docs.select(
        "text", bpe_encode(F.col("text"), model, spark).alias("toks")
    ).collect()
    for r in rows:
        joined = "".join(r["toks"]).replace(EOW, "")
        assert joined == "".join(_py_tokenize(r["text"]))
        # every word ends with an EOW-terminated symbol
        assert r["toks"][-1].endswith(EOW)


def test_frequent_word_becomes_single_token(spark):
    model = train_bpe(_docs(spark), num_merges=200)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    assert _py_bpe_encode("low", ranks, EOW) == ["low" + EOW]
    assert _py_bpe_encode("new", ranks, EOW) == ["new" + EOW]


def test_open_vocabulary_unknown_chars(spark):
    model = train_bpe(_docs(spark), num_merges=40)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    seg = _py_bpe_encode("zq9", ranks, EOW)
    assert "".join(seg).replace(EOW, "") == "zq9"


def test_token_count_and_segment(spark):
    docs = _docs(spark)
    model = train_bpe(docs, num_merges=60)
    seg = bpe_segment(docs, model)
    rows = {r["id"]: r for r in seg.collect()}
    assert set(rows) == set(range(len(CORPUS)))
    cnt = docs.select(
        "doc_id", bpe_token_count(F.col("text"), model, spark).alias("n")
    ).collect()
    for r in cnt:
        assert r["n"] == rows[r["doc_id"]]["n_tokens"] == len(rows[r["doc_id"]]["tokens"])
        assert 0 < r["n"]
    # more merges => tokenization never gets longer
    model2 = train_bpe(docs, num_merges=5)
    cnt2 = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count(F.col("text"), model2, spark).alias("n")
        ).collect()
    }
    for r in cnt:
        assert r["n"] <= cnt2[r["doc_id"]]


def test_artifact_roundtrip(spark, tmp_path):
    model = train_bpe(_docs(spark), num_merges=30)
    save_artifact(spark, str(tmp_path / "bpe.json"), model)
    loaded = load_artifact(spark, str(tmp_path / "bpe.json"))
    assert loaded["merges"] == model["merges"]
    ranks = {tuple(p): i for i, p in enumerate(loaded["merges"])}
    assert _py_bpe_encode("lowest", ranks, loaded["eow"]) == _py_bpe_encode(
        "lowest", {tuple(p): i for i, p in enumerate(model["merges"])}, EOW
    )


def test_min_pair_freq_stops_early(spark):
    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    model = train_bpe(docs, num_merges=100, min_pair_freq=2)
    # every pair is hapax -> no merges at all
    assert model["merges"] == []


def test_empty_corpus_raises(spark):
    docs = spark.createDataFrame([(1, None), (2, "   ")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bpe(docs, num_merges=10)


def test_bpe_encode_broadcast_cached_and_released(spark):
    """ADVICE r6: repeated bpe_encode calls must reuse ONE merge-table
    broadcast per (session, model) instead of accumulating one per call
    in executor storage; release_all() frees and clears the cache."""
    from pyspark.sql import functions as F

    from sifts_spark.caching import release_all
    from sifts_spark.operators.bpe import _BC_CACHE, bpe_encode, train_bpe

    docs = spark.createDataFrame(
        [(f"d{i}", "low lower lowest new newer") for i in range(6)],
        "doc_id string, text string",
    )
    model = train_bpe(docs, num_merges=10, sample_docs=6)
    release_all()
    assert not _BC_CACHE
    for _ in range(3):
        docs.select(bpe_encode(F.col("text"), model, spark)).collect()
    assert len(_BC_CACHE) == 1  # three calls, one broadcast
    # a content-identical model dict (e.g. artifact reload) also reuses
    model2 = {**model, "merges": [list(p) for p in model["merges"]]}
    docs.select(bpe_encode(F.col("text"), model2, spark)).collect()
    assert len(_BC_CACHE) == 1
    assert release_all() >= 1
    assert not _BC_CACHE


# ----------------------------------------------- token ids (r11 item 4)


def test_vocab_layout_and_determinism(spark):
    from sifts_spark.operators.bpe import SEP, UNK, bpe_vocab

    model = train_bpe(_docs(spark), num_merges=50)
    v = bpe_vocab(model)
    assert v[UNK] == 0 and v[SEP] == 1
    # alphabet block: sorted chars + EOW occupy ids 2..2+len(alphabet)
    alpha = model["alphabet"]
    assert [s for s, i in sorted(v.items(), key=lambda kv: kv[1])][2:2 + len(alpha)] == alpha
    # merge outputs follow in merge order
    first_merge = "".join(model["merges"][0])
    assert v[first_merge] == 2 + len(alpha)
    assert bpe_vocab(model) == v  # pure function of the dict


def test_encode_ids_mirrors_encode_symbols(spark):
    from sifts_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    docs = _docs(spark)
    model = train_bpe(docs, num_merges=60)
    v = bpe_vocab(model)
    rows = docs.select(
        "doc_id",
        bpe_encode(F.col("text"), model, spark).alias("syms"),
        bpe_encode_ids(F.col("text"), model, spark).alias("ids"),
    ).collect()
    assert rows
    for r in rows:
        assert [v[s] for s in r["syms"]] == r["ids"]


def test_decode_ids_roundtrip(spark):
    from sifts_spark.operators.bpe import bpe_decode_ids, bpe_encode_ids

    docs = _docs(spark)
    model = train_bpe(docs, num_merges=60)
    rows = docs.select(
        "text", bpe_encode_ids(F.col("text"), model, spark).alias("ids")
    ).collect()
    for r in rows:
        assert bpe_decode_ids(r["ids"], model) == " ".join(
            _py_tokenize(r["text"])
        )


def test_unknown_chars_encode_to_unk(spark):
    # the repo tokenizer keeps only ascii alnum runs, so "unknown" means
    # alnum chars absent from the training alphabet (CORPUS has no
    # j/z/7): they hit UNK while known words still encode
    from sifts_spark.operators.bpe import bpe_encode_ids

    model = train_bpe(_docs(spark), num_merges=40)
    assert "j" not in model["alphabet"] and "7" not in model["alphabet"]
    df = spark.createDataFrame([(1, "low jazz 777")], "doc_id long, text string")
    ids = df.select(
        bpe_encode_ids(F.col("text"), model, spark).alias("ids")
    ).first()["ids"]
    assert 0 in ids                   # j/z/7 symbols hit UNK
    assert any(i != 0 for i in ids)   # "low" still encodes


def test_legacy_model_without_alphabet_still_ids(spark):
    from sifts_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    model = train_bpe(_docs(spark), num_merges=40)
    legacy = {k: v for k, v in model.items() if k != "alphabet"}
    v = bpe_vocab(legacy)
    assert v and min(v.values()) == 0
    ids = (
        _docs(spark)
        .select(bpe_encode_ids(F.col("text"), legacy, spark).alias("ids"))
        .first()["ids"]
    )
    assert ids


def test_render_sequences_token_ids(spark):
    from sifts_spark.operators.bpe import SEP, bpe_decode_ids, bpe_vocab
    from sifts_spark.operators.sampling import pack_sequences, render_sequences

    docs = _docs(spark)
    model = train_bpe(docs, num_merges=60)
    from sifts_spark.operators.bpe import bpe_segment

    seg = bpe_segment(docs, model)
    seqs = pack_sequences(seg, "id", "n_tokens", max_tokens=64)
    rendered = render_sequences(
        seqs, docs.select(F.col("doc_id").cast("string").alias("id"), "text"),
        id_col="id", text_col="text", bpe_model=model,
    )
    rows = rendered.collect()
    assert rows and all("token_ids" in r.asDict() for r in rows)
    sep_id = bpe_vocab(model)[SEP]
    for r in rows:
        ids = r["token_ids"]
        # SEP joins exactly the members: n_docs-1 separators
        assert ids.count(sep_id) == r["n_docs"] - 1
        # decode equals the rendered text re-tokenized, modulo separator
        txt = " ".join(_py_tokenize(r["text"]))
        assert bpe_decode_ids(ids, model) == txt
        # budget agreement: ids (minus separators) == total_tokens
        assert len(ids) - (r["n_docs"] - 1) == r["total_tokens"]
