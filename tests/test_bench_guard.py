"""bench.py protocol machinery (round-10): the deviation guard that
keeps transient host epochs out of the committed artifact, the expected
-times file it reads, and the pinned-seed calibration workload.

No SparkSession needed — these are pure functions; keeping them
unit-tested is the verdict's done-condition for the r10 bench fix.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestNeedsRetry:
    def test_within_factor_no_retry(self):
        assert not bench.needs_retry(0.39, 0.2)  # 1.95x < 2x

    def test_beyond_factor_retries(self):
        assert bench.needs_retry(0.41, 0.2)  # 2.05x > 2x

    def test_r9_fictions_would_have_been_caught(self):
        # the exact numbers the r9 artifact shipped vs r8 truth
        assert bench.needs_retry(1.339, 0.182)  # meta_where_numeric
        assert bench.needs_retry(1.063, 0.196)  # order_paginate

    def test_no_expectation_degrades_to_noop(self):
        assert not bench.needs_retry(99.0, None)
        assert not bench.needs_retry(99.0, 0)
        assert not bench.needs_retry(99.0, -1)


class TestLoadExpected:
    def test_missing_file_gives_empty(self, tmp_path):
        assert bench.load_expected(str(tmp_path / "nope.json")) == {}

    def test_malformed_file_gives_empty(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert bench.load_expected(str(p)) == {}

    def test_committed_file_covers_every_headline_query(self):
        exp = bench.load_expected(os.path.join(REPO, "BENCH_EXPECTED.json"))
        missing = [q for q in bench.HEADLINE if q not in exp]
        assert not missing, f"BENCH_EXPECTED.json lacks {missing}"
        assert all(v > 0 for v in exp.values())

    def test_round_trip(self, tmp_path):
        p = tmp_path / "exp.json"
        p.write_text(json.dumps({"queries": {"q1": 0.5}}))
        assert bench.load_expected(str(p)) == {"q1": 0.5}


class TestCalibration:
    def test_pinned_workload_runs_and_is_positive(self):
        dt = bench.calibration_sec()
        # nominal ~2s; bound loosely — the POINT is it varies with the
        # host epoch, the test only pins that it runs and is sane
        assert 0.05 < dt < 60.0


class TestScaleGate:
    def test_mismatched_sf_disables_guard(self, tmp_path):
        import json

        p = tmp_path / "exp.json"
        p.write_text(json.dumps({"sf": 0.1, "queries": {"q": 0.2}}))
        assert bench.load_expected(str(p), sf=1.0) == {}
        assert bench.load_expected(str(p), sf=0.1) == {"q": 0.2}
        # legacy file without an sf field applies everywhere
        p2 = tmp_path / "legacy.json"
        p2.write_text(json.dumps({"queries": {"q": 0.2}}))
        assert bench.load_expected(str(p2), sf=1.0) == {"q": 0.2}
