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
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATES = (0.05, 0.10, 0.20)
N_PLANT = 200  # planted originals per rate (md5-order sample)


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
    planted: dict[float, set] = {}
    plants = []
    from sifts_spark.functions.text import TOKEN_SPLIT_RE

    toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)
    for rate in RATES:
        tag = f"dup{int(rate * 100)}-"
        # md5-keyed token drop: keep token i iff
        # unit_hash(doc_id:rate:i) >= rate — deterministic, position-
        # keyed, engine-replayable
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
        plants.append(
            originals.select(
                F.concat(F.lit(tag), F.col("doc_id")).alias("doc_id"),
                F.array_join(kept, " ").alias("text"),
            )
        )
        planted[rate] = {
            (r["doc_id"], f"{tag}{r['doc_id']}")
            for r in originals.select("doc_id").collect()
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
        for rate, want in planted.items():
            hit = sum(
                1 for a, b in want if tuple(sorted((a, b))) in found
            )
            out[f"recall_at_{rate}"] = round(hit / len(want), 4)
        return out

    results: dict[str, dict] = {}
    results["minhash_j0.5_16x4"] = run(
        lambda: minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
    )
    results["ngram_jaccard_j0.5"] = run(
        lambda: ngram_jaccard_pairs(corpus, threshold=0.5)
    )
    results["simhash_h8"] = run(lambda: simhash_pairs(corpus, max_hamming=8))
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
                "methods": results,
            }
        )
    )


if __name__ == "__main__":
    main()
