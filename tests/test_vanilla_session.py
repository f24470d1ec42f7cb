"""Every catalog entry must EXECUTE under a stock SparkSession.

The driver's correctness harness builds its own vanilla
``SparkSession.builder.getOrCreate()`` — none of ``get_spark``'s
defaults (UTC timezone, inferTimestampNTZ=false, Arrow, broadcast
threshold) exist there unless an entry sets them itself via ``_prep``
/ ``load_table``. Round 3 shipped a red driver row exactly this way:
the events-NTZ fix sat in the session factory the driver never calls,
so ``events_sessionize`` threw DATATYPE_MISMATCH only in the driver.

This test spawns a SUBPROCESS (so the session-scoped ``get_spark``
fixture session can't leak its confs in) with a bare-bones session and
runs every ``queries()`` entry end-to-end at sf0.001. Values are pinned
elsewhere (tools/check_correctness.py + the driver's DuckDB oracle);
here we pin "the plan resolves and executes under driver conditions".
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys

from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("vanilla-sweep").master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

failures = []
for name, fn in entrymod.queries().items():
    try:
        n = fn(spark, "/root/testdata/sf0.001").count()
        print(f"ok {name} rows={n}", flush=True)
    except Exception as e:
        failures.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
if failures:
    print("VANILLA-FAILURES:" + ",".join(failures))
    sys.exit(1)
print("VANILLA-ALL-GREEN")
"""


def test_catalog_green_under_stock_session():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # No SPARK_GRAFT_* tuning, no get_spark: the point is the absence of
    # our defaults.
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert "VANILLA-ALL-GREEN" in out, f"vanilla-session sweep failed:\n{out[-4000:]}"
