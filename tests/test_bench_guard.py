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

    def test_parallel_probe_runs_and_is_positive(self):
        # r16: the all-core epoch stamp (the r15 fts_cjk_substr
        # postmortem dimension). 2 workers keeps the test cheap; the
        # artifact path uses os.cpu_count().
        dt = bench.calibration_parallel_sec(workers=2)
        assert 0.05 < dt < 120.0


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


class TestArtifactDrift:
    EXP = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0, "e": 1.0}

    def test_clean_epoch_not_flagged(self):
        times = {q: 1.05 for q in self.EXP}
        assert bench.artifact_drift(times, self.EXP, 500) is None

    def test_r10_epoch_would_have_been_flagged(self):
        # the r10 signature: uniform ~1.3x drift, 2365 steal jiffies,
        # nothing over the per-query 2x gate
        times = {q: r for q, r in zip(self.EXP, (1.30, 1.28, 1.35, 1.52, 1.54))}
        d = bench.artifact_drift(times, self.EXP, 2365)
        assert d is not None and d["median_ratio"] == 1.35
        assert d["n_compared"] == 5

    def test_moderate_drift_needs_nonzero_steal(self):
        times = {q: 1.30 for q in self.EXP}
        assert bench.artifact_drift(times, self.EXP, 0) is None
        assert bench.artifact_drift(times, self.EXP, 1) is not None

    def test_heavy_drift_flags_even_at_zero_steal(self):
        times = {q: 1.45 for q in self.EXP}
        assert bench.artifact_drift(times, self.EXP, 0) is not None

    def test_single_query_spike_is_not_systematic(self):
        # one 3x outlier, everything else clean: the PER-QUERY guard's
        # job, not the artifact flag's
        times = dict.fromkeys(self.EXP, 1.0)
        times["e"] = 3.0
        assert bench.artifact_drift(times, self.EXP, 2000) is None

    def test_too_few_comparables_degrades_to_noop(self):
        assert bench.artifact_drift({"a": 2.0}, {"a": 1.0}, 5000) is None
        assert bench.artifact_drift({"a": 2.0, "b": 2.0}, self.EXP, 5000) is None

    def test_no_expectations_degrades_to_noop(self):
        times = {q: 9.9 for q in self.EXP}
        assert bench.artifact_drift(times, {}, 5000) is None

    def test_steal_unavailable_flags_moderate_band(self):
        # r11 ADVICE: hosts without /proc steal visibility sum steal as
        # zero — contention is invisible, so a uniform 1.3x epoch must
        # flag rather than coast until 1.40x.
        times = {q: 1.30 for q in self.EXP}
        assert bench.artifact_drift(times, self.EXP, 0, True) is None
        d = bench.artifact_drift(times, self.EXP, 0, False)
        assert d is not None and d["steal_available"] is False


class TestDeferredRemeasure:
    """r11 verdict item 6: the end-of-run self-healing pass for queries
    still suspect after MAX_EXTRA_SAMPLES immediate retries."""

    def test_contention_moved_clears_the_suspect(self):
        # during the main loop the query measured 3x expected; by the
        # deferred pass the contended window has moved and it measures
        # clean — the suspect list self-heals, samples stay auditable
        times = {"q": 0.60}
        runs = {"q": [[0.60, 500], [0.62, 480], [0.61, 510]]}
        fresh = iter([(0.21, 0), (0.20, 0), (0.22, 0)])
        still, cleared = bench.deferred_remeasure(
            ["q"], times, runs, {"q": 0.2}, lambda name: next(fresh)
        )
        assert still == [] and cleared == ["q"]
        assert times["q"] == 0.20  # best refreshed
        assert len(runs["q"]) == 6  # deferred samples appended

    def test_real_regression_stays_suspect(self):
        times = {"q": 0.60}
        runs = {"q": [[0.60, 0]]}
        still, cleared = bench.deferred_remeasure(
            ["q"], times, runs, {"q": 0.2}, lambda name: (0.58, 0)
        )
        assert still == ["q"] and cleared == []
        assert len(runs["q"]) == 1 + bench.DEFERRED_SAMPLES

    def test_mixed_suspects_partition_correctly(self):
        times = {"a": 0.9, "b": 0.9}
        runs = {"a": [[0.9, 0]], "b": [[0.9, 0]]}
        vals = {"a": (0.25, 0), "b": (0.85, 0)}
        still, cleared = bench.deferred_remeasure(
            ["a", "b"], times, runs, {"a": 0.2, "b": 0.2},
            lambda name: vals[name],
        )
        assert still == ["b"] and cleared == ["a"]


class TestSf1Floors:
    # r15: sf1 gets the same mechanical deviation guard as sf0.1
    def test_sf1_file_covers_every_headline_query(self):
        import bench

        exp = bench.load_expected(
            os.path.join(REPO, "BENCH_EXPECTED_sf1.json"), sf=1.0
        )
        missing = [q for q in bench.HEADLINE if q not in exp]
        assert not missing, f"BENCH_EXPECTED_sf1.json lacks {missing}"
        assert all(v > 0 for v in exp.values())

    def test_sf_gate_rejects_mismatched_scale(self):
        import bench

        # an sf0.1 run must NOT consume the sf1 floors
        assert (
            bench.load_expected(
                os.path.join(REPO, "BENCH_EXPECTED_sf1.json"), sf=0.1
            )
            == {}
        )
