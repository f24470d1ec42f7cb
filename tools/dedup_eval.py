"""Measured dedup quality: planted-near-dup recall per method.

Usage: python tools/dedup_eval.py [sf_dir]  (default /root/testdata/sf0.1;
run again with .scale/sf1 for the 10x column). Prints ONE JSON line ->
DEDUP_EVAL_sf*.json.

The ANN family ships measured recall artifacts (RECALL_sf*.json); this
is the same honesty for the near-dup family. Protocol: take a
deterministic md5-order sample of real corpus docs, plant ONE mutated
copy of each at token-drop rates {5%, 10%, 20%} (md5-keyed drops —
rerun-identical), then ask each pair finder for pairs over
corpus+plants and score RECALL on the planted (orig, dup) pairs.
Precision is not scored against the plants: the real corpus contains
natural near-dups (that is the point of the operators), so any
non-planted pair is unknown, not false. MinHash/ngram verify exact
Jaccard before emitting — their precision is definitional; SimHash and
embedding pairs are candidate-quality signals, thresholded.

Expected shape, not a tuning claim: recall falls as mutation rises and
as the method's granularity coarsens (3-gram shingle MinHash at
jaccard>=0.5 tolerates ~10% token drops; SimHash at hamming<=8 is
stricter; the 128-dim hashing embedding at cosine>=0.9 sits between).
The artifact records the thresholds with the numbers so the claim is
auditable.

Multiscript plants (r14, post-unicode-flip): the corpus is Latin-only,
so per-script recall is measured on deterministic char-translated
twins — each sampled original is mapped a->Cyrillic and a->CJK
letter-for-letter (pure ``F.translate``: token structure, lengths and
the md5 drop keys are preserved exactly), planted alongside a 10%%
token-drop mutation of the SAME translated text. Pre-flip these docs
tokenized to NOTHING (excluded from the finders); the per-script
recall rows pin that non-Latin scripts now dedup at parity with the
Latin rows.

Unspaced-CJK plants (late r14): the spaced translation above keeps the
Latin token structure, which real CJK text does not have. A second CJK
plant family strips ALL whitespace after the 10%%-drop mutation, so the
``recall_cjk_unspaced`` column contrasts the unicode family (whole-run
tokens -> ~zero recall, the documented failure mode) against the
``*_cjkbigram`` method rows (same finders under
``tokenizer="cjk_bigram"`` -> bigram-granular recall).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATES = (0.05, 0.10, 0.20)
N_PLANT = 200  # planted originals per rate (md5-order sample)

# letter-for-letter script maps (26 targets each, F.translate-ready);
# CJK chars are \p{L}, so space-separated token structure survives
_LATIN = "abcdefghijklmnopqrstuvwxyz"
_SCRIPTS = {
    "cyrillic": "абвгдежзийклмнопрстуфхцчшщъыьэюя"[:26],
    "cjk": "一二三四五六七八九十百千万上下左右中大小山水火木金土",
    # Hangul (r15): Korean is SPACE-delimited, so it is deliberately
    # excluded from the cjk_bigram run class (ES's analyzer makes the
    # same call) — the recall_korean rows MEASURE that scope decision:
    # spaced-Hangul near-dups must recall at parity with the Cyrillic
    # rows under the plain unicode family, with no bigram family needed
    "korean": "가나다라마바사아자차카타파하거너더러머버서어저처커터퍼허"[:26],
}
_SCRIPT_RATE = 0.10  # one mutation rate per script keeps runtime bounded


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from pyspark.sql import functions as F

    from sifts_spark.operators.dedup import (
        embedding_dup_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from sifts_spark.operators.embedding import embed_hashing
    from sifts_spark.session import get_spark
    from sifts_spark.sources.tables import load_table

    spark = get_spark(
        "sifts-dedup-eval",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )

    # deterministic md5-order originals (same draw on any engine)
    originals = (
        docs.orderBy(F.md5(F.col("doc_id")), F.col("doc_id"))
        .limit(N_PLANT)
        .persist()
    )
    planted: dict[str, set] = {}
    plants = []
    from sifts_spark.functions.text import TOKEN_SPLIT_RE

    def dropped_text(rate: float) -> F.Column:
        # md5-keyed token drop: keep token i iff
        # unit_hash(doc_id:rate:i) >= rate — deterministic, position-
        # keyed, engine-replayable
        toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)
        kept = F.filter(
            toks,
            lambda t, i: (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("doc_id"),
                                F.lit(str(rate)),
                                i.cast("string"),
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(65536.0)
                >= F.lit(rate)
            )
            & (t != F.lit("")),
        )
        return F.array_join(kept, " ")

    orig_ids = [r["doc_id"] for r in originals.select("doc_id").collect()]
    for rate in RATES:
        tag = f"dup{int(rate * 100)}-"
        plants.append(
            originals.select(
                F.concat(F.lit(tag), F.col("doc_id")).alias("doc_id"),
                dropped_text(rate).alias("text"),
            )
        )
        planted[f"at_{rate}"] = {(i, f"{tag}{i}") for i in orig_ids}

    # multiscript plants: char-translated originals + one 10%-drop twin
    # each (see module docstring). BOTH sides of each planted pair are
    # non-Latin — pre-flip the finders excluded them as zero-token.
    for script, alphabet in _SCRIPTS.items():
        trans = originals.select(
            F.concat(F.lit(f"{script}-"), F.col("doc_id")).alias("doc_id"),
            F.translate(F.lower(F.col("text")), _LATIN, alphabet).alias(
                "text"
            ),
        )
        # trans.doc_id is ALREADY '{script}-{orig}' — prefix only 'dup-'
        # (a second script prefix would break the pair bookkeeping below)
        dup = trans.select(
            F.concat(F.lit("dup-"), F.col("doc_id")).alias("doc_id"),
            dropped_text(_SCRIPT_RATE).alias("text"),
        )
        plants.append(trans)
        plants.append(dup)
        planted[script] = {
            (f"{script}-{i}", f"dup-{script}-{i}") for i in orig_ids
        }

    # unspaced-CJK plants (late r14, cjk_bigram family): real CJK text
    # carries no spaces, so near-dup structure lives INSIDE one run per
    # sentence. Translate → drop 10% tokens → strip ALL whitespace: the
    # unicode family then sees a handful of giant run-tokens per doc
    # (whole-run shingles → Jaccard ~0 between original and mutation —
    # its recall_cjk_unspaced row IS the documented failure mode), while
    # the cjk_bigram family recovers word-drop-scale overlap at bigram
    # granularity (the *_cjkbigram method rows).
    def despace(c):
        return F.regexp_replace(c, r"\s+", "")

    cjk_trans = originals.select(
        F.concat(F.lit("cjku-"), F.col("doc_id")).alias("doc_id"),
        F.translate(F.lower(F.col("text")), _LATIN, _SCRIPTS["cjk"]).alias(
            "text"
        ),
    )
    plants.append(cjk_trans.select("doc_id", despace(F.col("text")).alias("text")))
    plants.append(
        cjk_trans.select(
            F.concat(F.lit("dup-"), F.col("doc_id")).alias("doc_id"),
            despace(dropped_text(_SCRIPT_RATE)).alias("text"),
        )
    )
    planted["cjk_unspaced"] = {
        (f"cjku-{i}", f"dup-cjku-{i}") for i in orig_ids
    }

    corpus = docs
    for p in plants:
        corpus = corpus.unionByName(p)
    corpus = corpus.persist()
    n_corpus = corpus.count()

    def run(build) -> dict:
        # the timer brackets the COLLECT — building the DataFrame is
        # lazy plan construction, not method cost
        t0 = time.perf_counter()
        pairs_df = build()
        rows = pairs_df.select("id_a", "id_b").collect()
        sec = time.perf_counter() - t0
        found = {tuple(sorted((r["id_a"], r["id_b"]))) for r in rows}
        out = {"sec": round(sec, 3), "pairs_found": len(found)}
        for key, want in planted.items():
            hit = sum(
                1 for a, b in want if tuple(sorted((a, b))) in found
            )
            out[f"recall_{key}"] = round(hit / len(want), 4)
        return out

    results: dict[str, dict] = {}
    results["minhash_j0.5_16x4"] = run(
        lambda: minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
    )
    results["ngram_jaccard_j0.5"] = run(
        lambda: ngram_jaccard_pairs(corpus, threshold=0.5)
    )
    results["simhash_h8"] = run(lambda: simhash_pairs(corpus, max_hamming=8))
    from sifts_spark.functions.text import TOKENIZER_CJK

    results["minhash_j0.5_16x4_cjkbigram"] = run(
        lambda: minhash_lsh_pairs(
            corpus, jaccard_threshold=0.5, tokenizer=TOKENIZER_CJK
        )
    )
    results["ngram_jaccard_j0.5_cjkbigram"] = run(
        lambda: ngram_jaccard_pairs(
            corpus, threshold=0.5, tokenizer=TOKENIZER_CJK
        )
    )
    results["hash_embedding_cos0.9_ivf32"] = run(
        lambda: embedding_dup_pairs(
            embed_hashing(corpus, id_col="doc_id", dim=128)
            .withColumnRenamed("id", "vec_id"),
            id_col="vec_id",
            threshold=0.90,
            n_cells=32,
        )
    )

    originals.unpersist()
    corpus.unpersist()
    print(
        json.dumps(
            {
                "metric": "dedup_planted_recall",
                "sf_dir": sf_dir,
                "corpus_rows": n_corpus,
                "planted_per_rate": N_PLANT,
                "rates": list(RATES),
                "scripts": sorted(_SCRIPTS),
                "script_rate": _SCRIPT_RATE,
                "methods": results,
            }
        )
    )


if __name__ == "__main__":
    main()
