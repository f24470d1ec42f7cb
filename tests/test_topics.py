"""Topic discovery (topic_clusters): assignment pins with fixed
centroids, a c-TF-IDF Python value reference, and a trained-centroid
drive over the real corpus."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.topics import topic_clusters
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

# three separable vocabularies on three embedding axes
CORPUS = [
    ("a1", "soccer goal striker keeper league soccer match", [1.0, 0.0, 0.0]),
    ("a2", "striker league goal soccer penalty referee", [0.9, 0.1, 0.0]),
    ("a3", "keeper match league penalty goal corner", [0.8, 0.0, 0.2]),
    ("b1", "tensor gradient epoch optimizer tensor loss", [0.0, 1.0, 0.0]),
    ("b2", "gradient loss epoch batch tensor layer", [0.1, 0.9, 0.0]),
    ("b3", "optimizer layer batch gradient epoch", [0.0, 0.8, 0.2]),
    ("c1", "sourdough yeast flour crust bake oven", [0.0, 0.0, 1.0]),
    ("c2", "flour crust bake yeast dough oven", [0.0, 0.1, 0.9]),
    ("c3", "oven dough bake crust proof yeast", [0.2, 0.0, 0.8]),
    ("n1", None, [0.85, 0.05, 0.0]),          # null text still assigned
    ("x1", "stray words here", None),         # null embedding dropped
]
FIXED = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        CORPUS, "doc_id string, text string, embedding array<double>"
    )


class TestTopicClusters:
    def test_assignment_with_fixed_centroids(self, spark, corpus):
        assigned, topics = topic_clusters(corpus, centroids=FIXED)
        got = {r["id"]: r["topic_id"] for r in assigned.collect()}
        assert got == {
            "a1": 0, "a2": 0, "a3": 0, "n1": 0,
            "b1": 1, "b2": 1, "b3": 1,
            "c1": 2, "c2": 2, "c3": 2,
        }  # x1 (null embedding) absent
        sizes = {r["topic_id"]: r["n_docs"] for r in topics.collect()}
        assert sizes == {0: 4, 1: 3, 2: 3}

    def test_ctfidf_python_reference(self, spark, corpus):
        _, topics = topic_clusters(corpus, centroids=FIXED, k_terms=4)

        # independent reference: tokenize, count per class, score
        by_topic = {0: [], 1: [], 2: []}
        centroid_of = {"a": 0, "b": 1, "c": 2}
        for doc_id, text, vec in CORPUS:
            if vec is None or text is None:
                continue
            by_topic[centroid_of[doc_id[0]]].extend(
                re.findall("[a-z0-9]+", text.lower())
            )
        tf = {t: Counter(toks) for t, toks in by_topic.items()}
        f_t = Counter()
        for c in tf.values():
            f_t.update(c)
        a = sum(len(v) for v in by_topic.values()) / len(by_topic)

        want = {}
        for t, counts in tf.items():
            scored = sorted(
                (
                    (round(n * math.log(1 + a / f_t[term]), 6), term)
                    for term, n in counts.items()
                ),
                key=lambda x: (-x[0], x[1]),
            )[:4]
            want[t] = scored
        got = {}
        for r in topics.collect():
            got.setdefault(r["topic_id"], []).append(
                (r["rank"], r["score"], r["term"])
            )
        for t, rows in got.items():
            rows = [(s, term) for _, s, term in sorted(rows)]
            assert rows == want[t], t
        # topic-specific vocabulary outranks shared terms
        assert got[2][0][2] in {"bake", "crust", "oven", "yeast", "dough"}

    def test_textfree_topic_keeps_its_row(self, spark):
        # a cluster whose docs are ALL text-free must not vanish from
        # the audit: it keeps one row with NULL term/rank
        rows = [
            ("t1", "real words here", [1.0, 0.0]),
            ("t2", None, [0.0, 1.0]),
            ("t3", "", [0.0, 0.9]),
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, text string, embedding array<double>"
        )
        _, topics = topic_clusters(
            df, centroids=[(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        )
        got = {r["topic_id"]: r for r in topics.collect()}
        assert got[1]["n_docs"] == 2
        assert got[1]["term"] is None and got[1]["rank"] is None
        assert got[0]["term"] is not None
        assert sum(
            r["n_docs"] for r in
            {g["topic_id"]: g for g in got.values()}.values()
        ) == 3

    def test_trained_centroids_on_real_corpus(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        embs = load_table(spark, SF_DIR, "embeddings")
        df = docs.join(
            embs.select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
        )
        n = df.count()
        assert n > 0
        assigned, topics = topic_clusters(
            df, n_topics=6, k_terms=5, seed=7
        )
        a = assigned.collect()
        assert len(a) == n  # every embedded doc lands in exactly one topic
        t = topics.collect()
        by_topic = {}
        for r in t:
            by_topic.setdefault(r["topic_id"], []).append(r)
        assert len(by_topic) >= 2  # k-means found real structure
        total = 0
        for rows in by_topic.values():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            assert len(rows) <= 5
            total += rows[0]["n_docs"]
        assert total == n
        # deterministic for a fixed seed
        a2, _ = topic_clusters(df, n_topics=6, k_terms=5, seed=7)
        assert sorted((r["id"], r["topic_id"]) for r in a) == sorted(
            (r["id"], r["topic_id"]) for r in a2.collect()
        )


class TestCollectionTopics:
    def test_facade_topics(self, spark, tmp_path):
        from sifts_spark.collection import Collection

        def embed(texts):
            table = {
                "soccer": [1.0, 0.0], "striker": [0.9, 0.1],
                "keeper": [0.95, 0.05],
                "tensor": [0.0, 1.0], "gradient": [0.1, 0.9],
                "optimizer": [0.05, 0.95],
            }
            return [table[t.split()[0]] for t in texts]

        col = Collection(str(tmp_path), "t", spark=spark,
                         embedding_function=embed)
        col.add(
            ["soccer goal league", "striker penalty match",
             "keeper corner referee", "tensor loss epoch",
             "gradient batch layer", "optimizer epoch loss"],
            ids=["s1", "s2", "s3", "m1", "m2", "m3"],
        )
        assigned, topics = col.topics(
            centroids=[(0, [1.0, 0.0]), (1, [0.0, 1.0])], k_terms=3
        )
        got = {r["id"]: r["topic_id"] for r in assigned.collect()}
        assert got == {"s1": 0, "s2": 0, "s3": 0,
                       "m1": 1, "m2": 1, "m3": 1}
        terms = {}
        for r in topics.collect():
            terms.setdefault(r["topic_id"], set()).add(r["term"])
        assert terms[0] <= {"soccer", "goal", "league", "striker",
                            "penalty", "match", "keeper", "corner",
                            "referee"}
        assert terms[1] <= {"tensor", "loss", "epoch", "gradient",
                            "batch", "layer", "optimizer"}
