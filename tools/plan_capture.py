"""Capture .explain("formatted") for every declared query (plus the
headline retirees) into plans/<tag>/<query>_<suffix>.txt, with a
one-line plan-shape summary (Exchange count, join strategies, Python
eval nodes, pushed filters) printed per query and written as a JSON
summary next to the plans.

Usage: python tools/plan_capture.py <tag> <suffix> [name ...]
  e.g.: python tools/plan_capture.py r17 before
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "python_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                       r"MapInArrow|FlatMapGroupsInPandas)\b", plan)
        ),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed_nonempty": len(
            re.findall(r"PushedFilters: \[[^\]]", plan)
        ),
        "wsc_units": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    from sifts_spark.caching import release_all
    from sifts_spark.plans.catalog import (
        PREBUILT,
        QUERIES,
        fts_term,
        top_orders_revenue,
    )
    from sifts_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark(
        "sifts-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    runners = {
        **QUERIES,
        "top_orders_revenue": top_orders_revenue,
        "fts_term": fts_term,
    }

    # Mirror bench.py's PREBUILT setup so the captured plans for
    # fts_bm25 / fts_fuzzy / hybrid_rrf / dedup_clusters are the
    # steady-state TIMED shapes (on-disk postings + persisted minhash
    # pairs), not the in-query index build the bench times separately.
    if os.environ.get("SIFTS_PLAN_PREBUILT", "1") == "1":
        import tempfile

        from sifts_spark.operators import dedup as D
        from sifts_spark.operators import search as S
        from sifts_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        idx_dir = tempfile.mkdtemp(prefix="sifts_plan_postings_")
        S.write_postings(S.build_postings(docs, "doc_id", "text"), idx_dir)
        PREBUILT["postings"] = spark.read.parquet(idx_dir)
        PREBUILT["stats"] = S.corpus_stats(PREBUILT["postings"])
        pairs_dir = tempfile.mkdtemp(prefix="sifts_plan_pairs_")
        D.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, shingle_size=3,
            jaccard_threshold=0.5,
        ).write.mode("overwrite").parquet(pairs_dir)
        release_all()
        PREBUILT["minhash_pairs"] = spark.read.parquet(pairs_dir)
        PREBUILT["minhash_pairs_sf"] = SF_DIR
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    summary = {}
    for name, fn in runners.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure, keep going
            summary[name] = {"error": str(e)[:200]}
            print(f"ERR  {name}: {e}")
            release_all()
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        st = plan_stats(plan)
        summary[name] = st
        print(f"OK   {name}: {json.dumps(st)}")
        release_all()
    with open(os.path.join(out_dir, f"_summary_{suffix}.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
