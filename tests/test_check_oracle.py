"""The local oracle gate's tolerance mode: an ulp-level perturbation of
a pinned fixture (the signature of a numpy/BLAS upgrade) must be
diagnosed as STALE-regenerate, while a genuinely different value stays a
hard FAIL."""

from __future__ import annotations

import importlib.util
import math
import os

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_oracle)


def _rows(vals):
    return [{"id": i, "x": v} for i, v in enumerate(vals)]


class TestCompareValues:
    def test_exact_match_ok(self):
        status, _ = check_oracle.compare_values(
            _rows([1.25, 2.5]), ["id", "x"], _rows([1.25, 2.5]), ["id", "x"])
        assert status == "ok"

    def test_ulp_perturbation_is_stale(self):
        """Nudge a value across the 6-decimal rounding boundary by one
        ulp: the exact (rounded-repr) compare differs, the tolerance
        compare matches -> 'stale', with the regeneration diagnosis."""
        v = 0.1234565  # rounds to 0.123456 or 0.123457 depending on ulp
        pert = math.nextafter(v, 1.0)
        assert round(v, 6) != round(pert, 6)  # the boundary actually flips
        status, detail = check_oracle.compare_values(
            _rows([v, 2.5]), ["id", "x"], _rows([pert, 2.5]), ["id", "x"])
        assert status == "stale"
        assert "mismatch" in detail

    def test_real_difference_is_fail(self):
        status, _ = check_oracle.compare_values(
            _rows([1.25, 2.5]), ["id", "x"], _rows([1.25, 2.6]), ["id", "x"])
        assert status == "fail"

    def test_nan_pairs_match(self):
        status, _ = check_oracle.compare_values(
            _rows([float("nan")]), ["id", "x"],
            _rows([float("nan")]), ["id", "x"])
        assert status == "ok"

    def test_versions_note_mentions_drift_or_match(self):
        note = check_oracle._versions_note()
        assert ("versions match" in note) or ("drift" in note) \
            or ("no VERSIONS.json" in note)
