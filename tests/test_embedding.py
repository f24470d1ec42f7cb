"""Feature-hashing embeddings (embed_hashing / hashing_embedder):
kernel reference values, facade/bulk parity, similarity ordering, and
an e2e drive into the embedding-operator family on real corpus text."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.embedding import (
    embed_hashing,
    hashing_embedder,
)
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ref_vec(text, dim, ngrams, seed):
    import re

    toks = re.findall("[a-z0-9]+", text.lower()) if text else []
    vec = [0.0] * dim
    for n in ngrams:
        for i in range(len(toks) - n + 1):
            gram = " ".join(toks[i:i + n])
            h = hashlib.md5(f"{seed}\x00{gram}".encode()).digest()
            vec[int.from_bytes(h[:8], "big") % dim] += (
                1.0 if h[8] & 1 else -1.0
            )
    norm = math.sqrt(sum(x * x for x in vec))
    return [x / norm for x in vec] if norm > 0 else vec


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(x * x for x in b))
    return num / (da * db) if da > 0 and db > 0 else 0.0


class TestEmbedHashing:
    def test_reference_values_and_norms(self, spark):
        rows = [
            ("a", "the quick brown fox"),
            ("b", "the quick brown fox"),     # identical text
            ("c", "a completely different sentence about baking"),
            ("d", ""),
            ("e", None),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            r["id"]: list(r["embedding"])
            for r in embed_hashing(df, dim=64).collect()
        }
        for doc_id, text in rows:
            assert got[doc_id] == pytest.approx(
                _ref_vec(text, 64, (1, 2), 1)
            ), doc_id
        assert got["a"] == got["b"]
        assert sum(x * x for x in got["a"]) == pytest.approx(1.0)
        assert got["d"] == [0.0] * 64 == got["e"]

    def test_facade_bulk_parity_and_similarity(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(30)
        bulk = {
            r["id"]: list(r["embedding"])
            for r in embed_hashing(docs, dim=128).collect()
        }
        embed = hashing_embedder(dim=128)
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for did, t in texts.items():
            assert bulk[did] == pytest.approx(embed([t])[0]), did

        # near-duplicate text embeds closer than unrelated text
        t0 = next(iter(texts.values()))
        near = t0 + " extra trailing words"
        far = "sourdough yeast flour crust bake oven proof dough"
        v0, vn, vf = embed([t0, near, far])
        assert _cos(v0, vn) > 0.8 > _cos(v0, vf)

    def test_feeds_embedding_operator_family(self, spark):
        from sifts_spark.operators.dedup import embedding_dup_pairs
        from sifts_spark.operators.topics import topic_clusters

        docs = load_table(spark, SF_DIR, "documents").limit(80).select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        planted = docs.unionByName(
            docs.limit(3).select(
                F.concat(F.lit("dup-"), F.col("doc_id")).alias("doc_id"),
                "text",
            )
        )
        emb = embed_hashing(planted, id_col="doc_id", dim=128)
        # planted exact copies are found by embedding near-dup pairing
        pairs = embedding_dup_pairs(
            emb.withColumnRenamed("id", "vec_id"),
            id_col="vec_id", vec_col="embedding",
            threshold=0.999, n_cells=4,
        ).collect()
        found = {
            tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs
        }
        for r in docs.limit(3).collect():
            k = tuple(sorted((r["doc_id"], f"dup-{r['doc_id']}")))
            assert k in found, k
        # and the same column drives topic clustering end-to-end
        df = planted.join(
            emb.select(F.col("id").alias("doc_id"), "embedding"), "doc_id"
        )
        assigned, topics = topic_clusters(df, n_topics=4, seed=5)
        assert assigned.count() == planted.count()
        assert topics.count() >= 4
