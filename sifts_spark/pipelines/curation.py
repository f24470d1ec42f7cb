"""End-to-end corpus curation: the composite a training-data pipeline
actually runs, assembled from this repo's operators.

    raw docs ──┬─ language_id ──┐
               ├─ quality_score ─┼─ tag pass/fail per stage (ONE pass)
               └─ minhash LSH → clusters → canonical-keep ┘
                        │
                 kept docs → scrub_pii → token counts → curated frame
                        │
                 per-stage attrition report from ONE aggregation

Scale shape: the filter stages are map-side column tags — no row is
dropped until the end, so stage attrition comes from one groupBy over
the tag columns instead of a count() action per stage (at 100 TB,
five count() actions = five full scans). The only shuffles are the
ones the dedup operators already own (LSH band join + cluster
propagation over the dup SUBGRAPH, both |pairs|-sized).

Dedup keeps the canonical doc per near-dup cluster (cluster_id = min
doc id — deterministic, oracle-friendly), mirroring the "keep one per
group" step after any pairwise dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifts_spark.operators.dedup import duplicate_clusters, minhash_lsh_pairs
from sifts_spark.operators.textanalysis import (
    bpe_ish_token_count,
    language_id,
    quality_score,
    scrub_pii,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    jaccard_threshold: float = 0.5,
    scrub: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """→ ``(curated, report)``.

    ``curated``: (id, text, pred_lang, quality, n_tokens) — documents
    that pass language + quality gates AND are their near-dup cluster's
    canonical representative; ``text`` is PII-scrubbed when ``scrub``.

    ``report``: one row per (lang_ok, quality_ok, canonical) tag
    combination with ``n`` docs and ``tokens`` — the full attrition
    matrix from a single aggregation (not a count per stage).
    """
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    langs = language_id(base, id_col="id", text_col="text")
    qual = quality_score(base, id_col="id", text_col="text")

    # near-dup canonical flag over the whole corpus (dedup BEFORE the
    # cheap filters would also be defensible; after them it would couple
    # dedup results to filter settings — keep it independent)
    pairs = minhash_lsh_pairs(
        base, id_col="id", text_col="text", jaccard_threshold=jaccard_threshold
    )
    clusters = duplicate_clusters(base, pairs, id_col="id")

    tagged = (
        base.join(langs.select("id", "pred_lang"), "id")
        .join(qual.select("id", "quality"), "id")
        .join(clusters, "id")
        .withColumn("lang_ok", F.col("pred_lang").isin(*allowed_langs))
        .withColumn("quality_ok", F.col("quality") >= F.lit(min_quality))
        .withColumn("canonical", F.col("cluster_id") == F.col("id"))
        .withColumn("n_tokens", bpe_ish_token_count(F.col("text")))
    )

    report = (
        tagged.groupBy("lang_ok", "quality_ok", "canonical")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("tokens"),
        )
    )

    kept = tagged.filter(
        F.col("lang_ok") & F.col("quality_ok") & F.col("canonical")
    )
    out_text = scrub_pii(F.col("text")) if scrub else F.col("text")
    curated = kept.select(
        "id",
        out_text.alias("text"),
        "pred_lang",
        "quality",
        "n_tokens",
    )
    return curated, report
