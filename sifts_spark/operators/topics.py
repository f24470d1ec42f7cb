"""Corpus topic discovery: embedding k-means + c-TF-IDF labels.

The BERTopic recipe (Grootendorst 2022: embed -> cluster -> class-based
TF-IDF term ranking), re-expressed Spark-first: centroid training and
assignment reuse the ANN machinery (sampled spherical k-means, one
broadcast, map-side assignment — ``operators/vector_search.py``), and
the label stage is two vocabulary-bounded hash aggregates plus one
topic-partitioned window. Nothing is corpus-sized past the first
explode; no all-pairs anything.

What it's for in a training-data pipeline: corpus composition audits
("what IS in these 100 TB?"), mixture design inputs (topic weights for
``mix_corpus``), and targeted filtering (drop/boost whole topics) —
the curation counterpart of the per-doc quality signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sifts_spark.functions.text import tokenize


def topic_clusters(
    df: DataFrame,
    n_topics: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    k_terms: int = 10,
    centroids: list | None = None,
    sample_size: int = 65536,
    seed: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Cluster documents by embedding and label each cluster with its
    most distinguishing terms → ``(assignments, topics)``:

    - ``assignments``: (id, topic_id, sim) — every doc with a non-null
      embedding, assigned to its nearest centroid by rounded cosine
      (ties → lowest topic_id, the ``assign_cells`` contract, via the
      map-side :func:`~sifts_spark.functions.vector
      .cell_assign_sim_arrow` kernel — no crossJoin, no window);
    - ``topics``: (topic_id, n_docs, rank, term, tf, score) — the
      ``k_terms`` highest c-TF-IDF terms per topic, rank 1-based in
      (score desc, term asc) total order; a topic whose assigned docs
      are all text-free keeps one row with NULL term/tf/score/rank
      (every topic that received a doc appears, so ``n_docs`` sums to
      the assigned-corpus size).

    c-TF-IDF (Grootendorst 2022 §3.2): treat each topic's concatenated
    text as one class document; ``W(t, c) = tf(t, c) * ln(1 + A /
    f(t))`` with ``tf(t, c)`` the term's count inside the class,
    ``f(t)`` its corpus-wide count and ``A`` the average class token
    count — terms every topic shares score low, topic-specific
    vocabulary scores high, with no stopword list to maintain. ``A``
    averages over classes with ≥1 token (term-free classes have no
    class document to average).

    Centroids: pass ``centroids`` (``[(topic_id, [float, ...]), ...]``,
    e.g. a persisted artifact) to reuse a trained set; otherwise
    :func:`~sifts_spark.operators.vector_search.kmeans_centroids`
    trains spherical k-means on a ≤``sample_size`` seeded sample
    (``n_topics`` defaults to its √N rule — deterministic for a fixed
    (corpus, seed)).

    Scale shape: assignment is one Arrow argmax per row against the
    closure-shipped centroid matrix — text rides along in the same
    scan, so there is NO corpus self-join and NO shuffle before the
    label aggregate; the label stage is
    ONE (topic, term) hash aggregate with map-side partial combine
    (vocabulary x topics bounded, not corpus bounded), a term-keyed
    re-aggregate for ``f(t)``, a broadcast of the topic-count-sized
    class-length table, and a topic-partitioned window over
    vocabulary-sized rows. Docs with NULL text contribute no terms but
    still count toward ``n_docs``; docs with NULL embeddings are not
    assigned (they have no cluster to belong to) — filter upstream or
    backfill embeddings first. The tagged assignment frame is
    persisted (both returned frames and the class-length scalar share
    its one scan); it stays cached until the session evicts it —
    Spark's LRU keeps the leak bounded, and an explicit
    ``spark.catalog.clearCache()`` reclaims it eagerly.
    """
    from sifts_spark.functions.hashing import ensure_min_parallelism
    from sifts_spark.functions.vector import cell_assign_sim_arrow
    from sifts_spark.operators.vector_search import kmeans_centroids

    base = ensure_min_parallelism(
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("text"),
            F.col(vec_col).alias("v"),
        ).filter(F.col("v").isNotNull())
    )
    if centroids is None:
        centroids = kmeans_centroids(
            base, n_cells=n_topics, vec_col="v",
            sample_size=sample_size, seed=seed,
        )
    crows = [(int(cid), list(map(float, vec))) for cid, vec in centroids]
    # persisted: assignments, sizes, term_counts and the class-length
    # scalar all descend from this one scan — unpersisted, one action
    # over `topics` would re-run the Arrow assignment kernel and the
    # corpus scan 3-4x (once per lineage branch)
    tagged = base.select(
        "id", "text", cell_assign_sim_arrow(F.col("v"), crows).alias("_a")
    ).select(
        "id",
        "text",
        F.col("_a.cell_id").alias("topic_id"),
        F.col("_a.sim").alias("sim"),
    ).persist()
    assigned = tagged.select("id", "topic_id", "sim")

    docs = tagged.select("id", "text", "topic_id")
    sizes = assigned.groupBy("topic_id").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    term_counts = (
        docs.select(
            "topic_id", F.explode(tokenize(F.col("text"))).alias("term")
        )
        .groupBy("topic_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # f(t) and A derive from the (topic, term) counts — vocabulary-
    # sized inputs, no second corpus scan. The scalar collect also
    # materializes `tagged` into the persist, so later actions over
    # either returned frame hit the cache.
    term_totals = term_counts.groupBy("term").agg(
        F.sum("tf").alias("f_t")
    )
    class_lens = term_counts.groupBy("topic_id").agg(
        F.sum("tf").alias("class_len")
    )
    avg_row = class_lens.agg(F.avg("class_len").alias("a")).collect()[0]
    a = float(avg_row["a"] or 0.0)

    scored = (
        term_counts.join(term_totals, "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.lit(1.0) + F.lit(a) / F.col("f_t")),
                6,
            ),
        )
    )
    w = Window.partitionBy("topic_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_terms
    )
    # LEFT from sizes: a topic whose docs are all text-free has no term
    # rows, but it still happened — it surfaces as one row with NULL
    # term/tf/score/rank instead of vanishing from the audit
    topics = F.broadcast(sizes).join(ranked, "topic_id", "left").select(
        "topic_id", "n_docs", "rank", "term", "tf", "score"
    )
    return assigned, topics
