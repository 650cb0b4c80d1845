"""Numeric-extremes axis pins (r18): NaN / +-Inf / -0.0 semantics.

Two contracts, split by tier (tools/make_axis_corpora.py `extremes`):

- SIGNAL tier (dsp kernels through apply_kernel): non-finite samples
  are MISSING samples — the prefix-sum moving average is structurally
  non-robust to Inf (windows NOT containing the Inf still hit
  inf - inf = NaN through the poisoned cumulative sums) and the FFT
  kernels globalize any non-finite input, so masking at the kernel
  boundary is the only semantics both engines can express.
- VECTOR family: the excluded-vector contract
  (llm/similarity.vector_is_finite) — NULL or any non-finite component
  => no usable geometry; search/quantization excludes, dedup keeps as
  trivially-unique NULL-bucket rows.

Plus the ANSI regression that motivated try_cast in quantize_int8:
Catalyst's InferFiltersFromGenerate clones the quantization CASE into
the pushed-down filter and codegen CSE evaluates it BEFORE the
short-circuiting finiteness conjunct — with a plain cast the declared
query crashed (CAST_OVERFLOW) even though the filter precedes the
projection in the plan.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from physioview_spark.dsp.apply import moving_average
from physioview_spark.llm import similarity

NAN, INF = float("nan"), float("inf")


class TestFiniteSamplesKernel:
    def test_inf_is_missing_not_poison(self):
        x = np.array([1.0, 2.0, INF, 4.0, 5.0, 6.0, 7.0])
        out = moving_average(x, 3)
        # centered w=3: window [4,5,6] contains no Inf and must be
        # exactly finite — the naive cumsum would yield inf - inf = NaN
        assert out[4] == 5.0
        # windows containing the Inf average their finite members
        assert out[2] == (2.0 + 4.0) / 2
        assert np.isfinite(out).all()

    def test_all_nonfinite_window_is_nan(self):
        x = np.array([NAN, INF, -INF])
        out = moving_average(x, 3)
        assert all(math.isnan(v) for v in out)


class TestVectorIsFinite:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, None), (2, [NAN, 1.0]),
             (3, [1.0, INF]), (4, [-INF, 0.0]), (5, [9.0, 9.0])],
            "vec_id long, embedding array<float>")

    def test_predicate(self, emb):
        kept = sorted(r["vec_id"] for r in emb.where(
            similarity.vector_is_finite(F.col("embedding"))).collect())
        assert kept == [0, 5]

    def test_assign_bucket_null_for_excluded(self, emb):
        cents = [[0.0, 0.0], [10.0, 10.0]]
        for method in ("expr", "pandas"):
            rows = {r["vec_id"]: r["b"] for r in emb.withColumn(
                "b", similarity.assign_ivf_bucket(
                    F.col("embedding"), cents, method=method)).collect()}
            assert rows[1] is None and rows[2] is None, method
            assert rows[3] is None and rows[4] is None, method
            assert rows[0] == 0 and rows[5] == 1, method

    def test_probe_buckets_null_for_excluded(self, emb):
        cents = [[0.0, 0.0], [10.0, 10.0]]
        for method in ("expr", "pandas"):
            rows = {r["vec_id"]: r["p"] for r in emb.withColumn(
                "p", similarity.probe_ivf_buckets(
                    F.col("embedding"), cents, 2, method=method)).collect()}
            assert rows[2] is None and rows[3] is None, method
            assert rows[0] == [0, 1], method

    def test_semantic_dedup_keeps_excluded_as_null_bucket(self, emb):
        out = {r["vec_id"]: r["bucket"] for r in similarity.semantic_dedup(
            emb, [[0.0, 0.0], [10.0, 10.0]], threshold=0.99).collect()}
        # every excluded vector survives with a NULL bucket
        for vid in (1, 2, 3, 4):
            assert vid in out and out[vid] is None
        assert out[0] == 0 and out[5] == 1

    def test_quantize_ansi_generate_regression(self, emb):
        # posexplode triggers InferFiltersFromGenerate; under ANSI the
        # cloned CASE used to throw CAST_OVERFLOW on the NaN row even
        # though quantize_int8's finiteness filter precedes it
        rows = (similarity.quantize_int8(emb)
                .select("vec_id", F.posexplode("q_embedding"))
                .collect())
        assert sorted({r["vec_id"] for r in rows}) == [0, 5]

    def test_cosine_topk_excludes_nonfinite(self, emb):
        out = similarity.cosine_topk(emb, emb, k=3).collect()
        ids = {r["query_id"] for r in out} | {r["match_id"] for r in out}
        assert ids == {0, 5}
