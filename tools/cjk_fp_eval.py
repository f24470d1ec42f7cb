"""Measured cjk_bigram cross-run over-match: false-positive rate.

Usage: python tools/cjk_fp_eval.py [sf_dir]  (default /root/testdata/sf0.1).
Prints ONE JSON line -> CJK_FP_EVAL.json.

The cjk_bigram family gives substring search over unspaced CJK runs by
expanding runs to character bigrams and compiling a query run to a
consecutive-bigram Phrase. Documented trade (functions/text.py:72-77,
Lucene CJKAnalyzer parity): bigram positions are consecutive ACROSS
written token boundaries, so the query run "ABC" (bigrams AB, BC) also
matches a doc written "...AB BC..." — the gram chain split over two
adjacent runs — even though the doc never contains the written string
"ABC". This tool turns that documented posture into a measured number
(the r14 verdict: decide from data, not posture).

Ground truth is EXACT for pure-CJK queries: maximal-run tokenization
means a query run occurs within one doc run iff it occurs contiguously
in the raw text at all, so ``contains(lower(text), q)`` IS the
FTS5-trigram-grade truth, and any bigram-Phrase match without it is a
cross-boundary false positive. (Length-2 queries are a single bigram —
FP-free by construction; the measurement uses lengths 3-5.)

Corpus: the sf corpora are Latin, so docs are char-translated to CJK
letter-for-letter (the DEDUP_EVAL recipe — token structure preserved),
then re-spaced two ways:

* ``spaced``  — every word boundary kept: maximal boundary density,
  the adversarial worst case for cross-run chains;
* ``clause``  — ~1/6 of boundaries kept (md5-keyed): run lengths that
  look like real unspaced Chinese with punctuation between clauses.

Queries per variant (md5-deterministic):

* ``natural``  — substrings sampled INSIDE single runs (what a user
  searches: strings that exist in the corpus as written);
* ``boundary`` — strings spanning one written boundary (the
  over-match's target shape: every match that isn't coincidentally
  within-run elsewhere is an FP).

Reported per variant x query-class: matched doc-pairs, false-positive
doc-pairs, fp_rate = fp / matched (micro-averaged over queries), plus
the wall cost of the exact contains-verify relative to match alone —
the number that decides whether the opt-in verify is worth its cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LATIN = "abcdefghijklmnopqrstuvwxyz"
_CJK26 = "一二三四五六七八九十百千万上下左右中大小山水火木金土"[:26]

N_QUERY_DOCS = 60  # docs sampled for query material
Q_PER_CLASS = 100  # natural / boundary queries per corpus variant
Q_LENGTHS = (3, 4, 5)
CLAUSE_KEEP = 6  # keep ~1/6 of word boundaries in the clause variant


def _h(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from pyspark.sql import functions as F

    from sifts_spark.functions.text import TOKENIZER_CJK, tokenize
    from sifts_spark.session import get_spark
    from sifts_spark.sources.tables import load_table

    spark = get_spark(
        "sifts-cjk-fp-eval",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.translate(F.lower(F.col("text")), _LATIN, _CJK26).alias("cjk"),
    )

    # clause variant: md5-keyed per-boundary keep decision — join words
    # back with '' except every ~CLAUSE_KEEP-th boundary keeps a space
    words = F.split(F.col("cjk"), r"\s+")
    joined = F.aggregate(
        F.filter(words, lambda w: w != F.lit("")),
        F.lit(""),
        lambda acc, w: F.concat(
            acc,
            F.when(
                (acc == F.lit(""))
                | (
                    F.conv(
                        F.substring(F.md5(F.concat(acc, w)), 1, 4), 16, 10
                    ).cast("int")
                    % CLAUSE_KEEP
                    != 0
                ),
                F.lit(""),
            ).otherwise(F.lit(" ")),
            w,
        ),
    )
    corpus = docs.select(
        "doc_id", F.col("cjk").alias("spaced"), joined.alias("clause")
    ).persist()
    n_docs = corpus.count()

    # ---- query material (driver-side, deterministic) -----------------
    sample = (
        corpus.orderBy(F.md5(F.col("doc_id")), F.col("doc_id"))
        .limit(N_QUERY_DOCS)
        .collect()
    )
    run_re = re.compile(f"[{_CJK26}]{{2,}}")

    def make_queries(texts: list[str]) -> tuple[list[str], list[str]]:
        natural: list[str] = []
        boundary: list[str] = []
        for ti, t in enumerate(texts):
            runs = [m.group() for m in run_re.finditer(t)]
            for ri, r in enumerate(runs):
                L = Q_LENGTHS[_h(f"L:{ti}:{ri}") % len(Q_LENGTHS)]
                if len(r) >= L and len(natural) < Q_PER_CLASS:
                    start = _h(f"s:{ti}:{ri}") % (len(r) - L + 1)
                    natural.append(r[start : start + L])
                if (
                    ri + 1 < len(runs)
                    and len(boundary) < Q_PER_CLASS
                    and len(runs[ri]) >= 2
                    and len(runs[ri + 1]) >= 2
                ):
                    # span one written boundary: tail of run i + head of
                    # run i+1 (2+1 or 1+2 chars, md5-keyed)
                    k = 1 + _h(f"b:{ti}:{ri}") % 2
                    boundary.append(runs[ri][-k:] + runs[ri + 1][: 3 - k])
            if len(natural) >= Q_PER_CLASS and len(boundary) >= Q_PER_CLASS:
                break
        # dedupe, keep deterministic order
        return (
            list(dict.fromkeys(natural)),
            list(dict.fromkeys(boundary)),
        )

    out: dict = {
        "metric": "cjk_bigram_crossrun_fp",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "n_docs": n_docs,
        "variants": {},
    }

    def bigrams(q: str) -> list[str]:
        return [q[i : i + 2] for i in range(len(q) - 1)]

    for variant in ("spaced", "clause"):
        texts = [r[variant] for r in sample]
        natural, boundary = make_queries(texts)
        toks = tokenize(F.col(variant), TOKENIZER_CJK)
        hay = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
        raw = F.col(variant)
        for qclass, queries in (("natural", natural), ("boundary", boundary)):
            aggs = []
            for qi, q in enumerate(queries):
                needle = " " + " ".join(bigrams(q)) + " "
                pred = hay.contains(needle)
                truth = raw.contains(q)
                aggs.append(
                    F.sum(pred.cast("long")).alias(f"m{qi}")
                )
                aggs.append(
                    F.sum((pred & ~truth).cast("long")).alias(f"f{qi}")
                )
            t0 = time.time()
            row = corpus.agg(*aggs).collect()[0]
            wall = time.time() - t0
            matched = sum(row[f"m{qi}"] for qi in range(len(queries)))
            fps = sum(row[f"f{qi}"] for qi in range(len(queries)))
            # verify-cost contrast: match-only vs match + contains-verify
            t0 = time.time()
            corpus.agg(
                *[
                    F.sum(
                        hay.contains(
                            " " + " ".join(bigrams(q)) + " "
                        ).cast("long")
                    ).alias(f"m{qi}")
                    for qi, q in enumerate(queries)
                ]
            ).collect()
            wall_match_only = time.time() - t0
            t0 = time.time()
            corpus.agg(
                *[
                    F.sum(
                        (
                            hay.contains(" " + " ".join(bigrams(q)) + " ")
                            & raw.contains(q)
                        ).cast("long")
                    ).alias(f"m{qi}")
                    for qi, q in enumerate(queries)
                ]
            ).collect()
            wall_verified = time.time() - t0
            out["variants"][f"{variant}_{qclass}"] = {
                "queries": len(queries),
                "matched_doc_pairs": int(matched),
                "fp_doc_pairs": int(fps),
                "fp_rate": round(fps / matched, 4) if matched else None,
                "wall_sec": round(wall, 3),
                "wall_match_only": round(wall_match_only, 3),
                "wall_with_verify": round(wall_verified, 3),
            }

    corpus.unpersist()
    # single-shot wall clocks on a multi-second query carry the bench
    # artifacts' documented ±host-epoch noise — a with-verify column
    # occasionally reading BELOW match-only (r15's spaced_boundary:
    # 3.49 vs 3.85) is epoch noise, not negative verify cost
    out["_noise_note"] = (
        "wall_* columns are single-shot (not best-of-N): treat "
        "differences under ~25% as host-epoch noise (see "
        "BENCH_EXPECTED.json protocol); fp counts are exact and "
        "epoch-independent"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
