"""Interleaved A/B micro-bench for optimization candidates.

Runs variant thunks in ABAB... order (epoch drift cancels to first
order), noop-sink timing, best-of and per-sample output. Used by the
r17 optimization round to judge candidate rewrites before they land;
kept in tools/ so the measurements in OPTIMIZATION_r17.md are
reproducible.

Usage: python tools/ab_bench.py <case> [sf_dir] [rounds]
Cases are registered in CASES below; each returns a dict of
name -> fn(spark, sf_dir) -> DataFrame.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def run_case(variants: dict, sf_dir: str, rounds: int = 4) -> None:
    from sifts_spark.caching import release_all
    from sifts_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark(
        "sifts-ab-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one warm pass each (codegen compile outside timing)
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_all()

    samples: dict[str, list] = {n: [] for n in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            s0 = steal()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"ab:{name}:{r}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples[name].append((round(dt, 3), steal() - s0))
            release_all()
    for name, ss in samples.items():
        best = min(s for s, _ in ss)
        med = sorted(s for s, _ in ss)[len(ss) // 2]
        print(f"{name:28s} best {best:7.3f}  med {med:7.3f}  runs {ss}")


# ---------------------------------------------------------------- cases


def case_quality(variant_mod):
    """text_quality current vs punct-by-length-diff vs bound-tokens."""
    raise NotImplementedError  # case bodies live in the __main__ block


if __name__ == "__main__":
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from sifts_spark.sources.tables import load_table

    if case == "calib":
        import bench

        print("single:", bench.calibration_sec())
        print("parallel:", bench.calibration_parallel_sec())
        sys.exit(0)

    CASES: dict = {}

    if case == "quality":
        from sifts_spark.operators import textanalysis as TA

        def cur(spark, sf):
            return TA.quality_score(load_table(spark, sf, "documents"))

        CASES = {"hof_current": cur}
        run_case(CASES, sf_dir, rounds)
    else:
        print(f"unknown case {case}")
        sys.exit(1)
