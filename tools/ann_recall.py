"""Measure ANN recall@k against the exact kNN baseline.

Compares, on one embeddings corpus:
  * ``ivf[oracle]``  — ivf_knn_join with the catalog's pinned config
    (deterministic lowest-id seed centroids, n_cells=8, nprobe=2): the
    correctness-gate posture, NOT the production one.
  * ``ivf[kmeans]``  — ivf_knn_join with kmeans_centroids (sampled
    spherical k-means, n_cells ~ sqrt(N)) at a few nprobe settings:
    the production posture.
  * ``srp``          — srp_knn_join (32 planes / 4 bands, the catalog
    config) and a higher-recall 64/8 setting.

recall@k = |approx top-k ∩ exact top-k| / k, averaged over the query
batch. Prints ONE JSON line; run at sf0.1 and sf1 (tools/make_scale.py)
for the two-scale table in SURVEY §6.1.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["id"])
    return out


def _recall(approx: dict, exact: dict, k: int) -> float:
    if not exact:
        return 0.0
    return round(
        sum(len(approx.get(q, set()) & ids) / len(ids) for q, ids in exact.items())
        / len(exact),
        4,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pyspark.sql import functions as F

    from sifts_spark.operators import vector_search as V
    from sifts_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "ann-recall",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    queries = emb.orderBy("vec_id").limit(n_queries)

    exact = _topk_sets(V.knn_join(emb, queries, k=k))

    results: dict = {}
    oracle_cents = V.centroid_rows(V.deterministic_centroids(emb, n_cells=8))
    results["ivf_oracle_cells8_nprobe2"] = _recall(
        _topk_sets(V.ivf_knn_join(emb, queries, oracle_cents, k=k, nprobe=2)),
        exact,
        k,
    )
    km = V.kmeans_centroids(emb)
    bal = V.ivf_cell_counts(emb, km)
    for nprobe in (2, 4, 8):
        results[f"ivf_kmeans_sqrtN_nprobe{nprobe}"] = _recall(
            _topk_sets(V.ivf_knn_join(emb, queries, km, k=k, nprobe=nprobe)),
            exact,
            k,
        )
    for planes, bands in ((32, 4), (64, 8)):
        results[f"srp_planes{planes}_bands{bands}"] = _recall(
            _topk_sets(
                V.srp_knn_join(
                    emb, queries, dim=dim, k=k, n_planes=planes, bands=bands
                )
            ),
            exact,
            k,
        )

    from sifts_spark.operators import quantization as Q

    books = Q.pq_train(emb, dim=dim, m=8, nbits=8)
    codes = Q.pq_encode(emb, books)
    results["pq_adc_only"] = _recall(
        _topk_sets(Q.pq_knn_join(codes, queries, books, k=k)), exact, k
    )
    results["pq_refine4"] = _recall(
        _topk_sets(Q.pq_knn_join(codes, queries, books, k=k, refine=4, vectors=emb)),
        exact, k,
    )
    results["ivfpq_kmeans_nprobe4_refine4"] = _recall(
        _topk_sets(
            Q.ivfpq_knn_join(emb, queries, km, books, k=k, nprobe=4, refine=4)
        ),
        exact, k,
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "dim": dim,
                "k": k,
                "n_queries": n_queries,
                "kmeans_n_cells": len(km),
                "kmeans_imbalance": round(bal["imbalance"], 3),
                "recall_at_k": results,
            }
        )
    )


if __name__ == "__main__":
    main()
