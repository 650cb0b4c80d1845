"""Structured Streaming tests: the windowed SQA operators must produce
identical results in batch and streaming mode (availableNow trigger,
memory sink), and the stateful IBI operator must carry state across
micro-batches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from physioview_spark.streaming import (
    await_stream, drop_near_dup_state, near_dup_batch_processor,
)

SCHEMA = ("subject_id string, ts timestamp, beat double, artifact double")


REAL_END = pd.Timestamp("2024-01-01 00:05:00")


def _sample_frame(n_subj=3, seconds=300, beat_every=1.0):
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for s in range(n_subj):
        rng = np.random.default_rng(s)
        t = 0.0
        while t < seconds:
            ts = base + np.timedelta64(int(t * 1e6), "us")
            rows.append((f"s{s}", pd.Timestamp(ts),
                         1.0, 1.0 if rng.random() < 0.1 else None))
            t += beat_every * (0.9 + 0.2 * rng.random())
        # sentinel far past the real range: advances the watermark so
        # append mode flushes every real window before availableNow ends
        rows.append((f"s{s}",
                     pd.Timestamp(base + np.timedelta64(2, "h")),
                     None, None))
    return pd.DataFrame(rows, columns=["subject_id", "ts", "beat",
                                       "artifact"])


@pytest.fixture(scope="module")
def beat_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "beats")
    pdf = _sample_frame()
    spark.createDataFrame(pdf, SCHEMA).repartition(4).write.parquet(p)
    return p


def _run_stream(spark, stream_df, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append" if stream_df.isStreaming else "complete")
         .trigger(availableNow=True).start())
    await_stream(q, 120)
    return spark.table(name)


def _collect_sorted(df, cols):
    return [tuple(r) for r in
            df.select(*cols).orderBy(*cols).collect()]


class TestWindowedParity:
    def test_segment_sqa_batch_vs_stream(self, spark, beat_parquet):
        from physioview_spark.streaming import streaming_segment_sqa

        batch = spark.read.parquet(beat_parquet)
        stream = spark.readStream.schema(SCHEMA).parquet(beat_parquet)

        got_b = streaming_segment_sqa(batch)
        q = (streaming_segment_sqa(stream)
             .writeStream.format("memory").queryName("seg_sqa")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got_s = spark.table("seg_sqa")

        cols = ["subject_id", "segment_start", "n_detected", "n_artifact",
                "invalid"]
        got_b = got_b.where(F.col("segment_start") < F.lit(REAL_END))
        got_s = got_s.where(F.col("segment_start") < F.lit(REAL_END))
        assert _collect_sorted(got_b, cols) == _collect_sorted(got_s, cols)
        # sanity: ~60 beats/min -> never invalid at default thresholds
        # (valid segments carry NULL, matching batch compute_metrics)
        assert all(r["invalid"] is None for r in got_b.collect())

    def test_invalid_rule_matches_batch_at_seg30(self, spark):
        """P7 parity: the streaming Invalid rule must equal the batch twin
        (operators.metrics.compute_metrics) on the same frame at a non-60 s
        segment size — lower bound scales (min_hr*seg/60), the 220 upper
        bound is FLAT, valid segments are NULL (reference:
        pipeline/SQA.py:193-196)."""
        from physioview_spark.operators.metrics import compute_metrics
        from physioview_spark.streaming import streaming_segment_sqa

        fs, seg = 10.0, 30
        # 3 x 30 s segments: 10 beats (< lo=20 -> invalid), 150 beats
        # (>110: the old scaled bound would flag it; flat 220 must NOT),
        # 30 beats (valid)
        beat_idx = set()
        for s0, n in ((0, 10), (300, 150), (600, 30)):
            beat_idx |= {s0 + int(i * 300 / n) for i in range(n)}
        rows = [("a", i, 1.0 if i in beat_idx else 0.0, 0.0)
                for i in range(900)]
        samples = spark.createDataFrame(
            rows, "subject_id string, sample_idx long, beat double, "
                  "artifact double")

        batch = {r["segment"]: r["invalid"]
                 for r in compute_metrics(samples, fs=fs, seg_size=seg,
                                          with_ts=False).collect()}

        base = pd.Timestamp("2024-01-01")
        ts_col = F.to_timestamp(
            F.lit(str(base))) + F.make_interval(
                secs=F.col("sample_idx") / F.lit(fs))
        stream_in = samples.withColumn("ts", ts_col)
        got = {int((r["segment_start"] - base).total_seconds() // seg) + 1:
               r["invalid"]
               for r in streaming_segment_sqa(
                   stream_in, seg_seconds=seg).collect()}

        assert got == {1: 1, 2: None, 3: None}
        assert {k: batch[k] for k in got} == got

    def test_rolling_sqa_batch_vs_stream(self, spark, beat_parquet):
        from physioview_spark.streaming import streaming_rolling_sqa

        batch = spark.read.parquet(beat_parquet)
        stream = spark.readStream.schema(SCHEMA).parquet(beat_parquet)
        got_b = streaming_rolling_sqa(batch, 60, 15)
        q = (streaming_rolling_sqa(stream, 60, 15)
             .writeStream.format("memory").queryName("roll_sqa")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got_s = spark.table("roll_sqa")
        cols = ["subject_id", "window_start", "n_detected", "n_artifact"]
        got_b = got_b.where(F.col("window_start") < F.lit(REAL_END))
        got_s = got_s.where(F.col("window_start") < F.lit(REAL_END))
        assert _collect_sorted(got_b, cols) == _collect_sorted(got_s, cols)

    def test_eda_extended_batch_vs_stream(self, spark, tmp_path):
        """A12 extended twin: the order-dependent extended feature set
        cannot run as incremental analytic windows, so the streaming
        shape buffers each TUMBLING window in keyed state and emits on
        watermark close (applyInPandasWithState) — every closed window
        must match the relational batch gear value-for-value, including
        the three entropies and the closed-form svd."""
        from physioview_spark.streaming import (
            streaming_eda_features_extended,
        )

        rng = np.random.default_rng(31)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        n = 4 * 600  # 10 min at 4 Hz
        rows = []
        for s in range(2):
            phasic = np.round(rng.standard_normal(n) * 0.2, 2)  # ties
            for i in range(n):
                rows.append((f"s{s}",
                             pd.Timestamp(base + np.timedelta64(
                                 int(i * 1e6 / 4), "us")),
                             float(phasic[i])))
            rows.append((f"s{s}",
                         pd.Timestamp(base + np.timedelta64(2, "h")),
                         0.0))  # watermark-advancing sentinel
        sch = "subject_id string, ts timestamp, phasic double"
        pdf = pd.DataFrame(rows, columns=["subject_id", "ts", "phasic"])
        p = str(tmp_path / "eda_ext")
        spark.createDataFrame(pdf, sch).repartition(3).write.parquet(p)

        got_b = streaming_eda_features_extended(
            spark.read.parquet(p), value_cols=["phasic"])
        q = (streaming_eda_features_extended(
                spark.readStream.schema(sch).parquet(p),
                value_cols=["phasic"])
             .writeStream.format("memory").queryName("eda_ext")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got_s = spark.table("eda_ext")

        cut = F.lit(pd.Timestamp("2024-01-01 00:10:00"))
        b = (got_b.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        s = (got_s.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        assert len(b) == len(s) >= 6
        # column ORDER differs (batch groups base-then-extended); the
        # SET must match and every value must agree by name
        assert set(b.columns) == set(s.columns)
        for c in sorted(b.columns):
            if b[c].dtype == object or "window" in c or c == "subject_id":
                assert list(b[c]) == list(s[c]), c
            else:
                np.testing.assert_allclose(
                    b[c].to_numpy(dtype=float), s[c].to_numpy(dtype=float),
                    rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=c)

    @pytest.mark.parametrize("window_s,step_s", [
        (120, 40),   # overlap x3, divisor geometry (the r15 pin)
        (180, 60),   # the batch gear's default geometry
        (100, 30),   # NON-divisor: window % step != 0 — the epoch-aligned
                     # floordiv explode is exactly where a window-assignment
                     # off-by-one would hide (VERDICT r15 item 3)
    ])
    def test_eda_extended_sliding_batch_vs_stream(
            self, spark, tmp_path, window_s, step_s):
        """A12 extended twin at SLIDING geometries (r15, VERDICT r14
        item 4; r16 adds the default and a non-divisor geometry per
        VERDICT r15 item 3): each sample is replicated into its covering
        epoch-aligned windows before the stateful groupBy, so every
        closed overlapping window must match the relational batch gear
        value-for-value."""
        from physioview_spark.streaming import (
            streaming_eda_features_extended,
        )

        rng = np.random.default_rng(47)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        n = 2 * 480  # 8 min at 2 Hz
        rows = []
        for s in range(2):
            phasic = np.round(rng.standard_normal(n) * 0.2, 2)  # ties
            # keep ties (entropy census) but pull window means off the
            # 0.01 grid: with all-quantized values a window's exact
            # mean can LAND on a sample value, and then `x > mean`
            # flips with the engines' different summation orders (a
            # knife edge in the semantics, not a bug — one window here
            # hit it)
            phasic[::7] += 1e-3 * np.sqrt(2.0)
            for i in range(n):
                rows.append((f"s{s}",
                             pd.Timestamp(base + np.timedelta64(
                                 int(i * 1e6 / 2), "us")),
                             float(phasic[i])))
            rows.append((f"s{s}",
                         pd.Timestamp(base + np.timedelta64(2, "h")),
                         0.0))  # watermark-advancing sentinel
        sch = "subject_id string, ts timestamp, phasic double"
        pdf = pd.DataFrame(rows, columns=["subject_id", "ts", "phasic"])
        p = str(tmp_path / "eda_ext_slide")
        spark.createDataFrame(pdf, sch).repartition(3).write.parquet(p)

        kw = dict(value_cols=["phasic"], window_seconds=window_s,
                  step_seconds=step_s)
        got_b = streaming_eda_features_extended(
            spark.read.parquet(p), **kw)
        qname = f"eda_ext_slide_{window_s}_{step_s}"
        q = (streaming_eda_features_extended(
                spark.readStream.schema(sch).parquet(p), **kw)
             .writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got_s = spark.table(qname)

        cut = F.lit(pd.Timestamp("2024-01-01 00:08:00"))
        b = (got_b.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        s = (got_s.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        # overlapping windows: >= (480 s span / step) per subject
        assert len(b) == len(s) >= 2 * (480 // step_s)
        assert set(b.columns) == set(s.columns)
        for c in sorted(b.columns):
            if b[c].dtype == object or "window" in c or c == "subject_id":
                assert list(b[c]) == list(s[c]), c
            else:
                np.testing.assert_allclose(
                    b[c].to_numpy(dtype=float), s[c].to_numpy(dtype=float),
                    rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=c)

    def test_eda_extended_rejects_step_above_window(self, spark):
        """Gapped geometries (step > window) silently DROP samples from
        every window; the extended twin refuses them explicitly."""
        import pytest

        from physioview_spark.streaming import (
            streaming_eda_features_extended,
        )

        df = spark.createDataFrame(
            [], "subject_id string, ts timestamp, phasic double")
        with pytest.raises(ValueError, match="step_seconds"):
            streaming_eda_features_extended(
                df, value_cols=["phasic"], window_seconds=60,
                step_seconds=120)

    def test_eda_features_batch_vs_stream(self, spark, tmp_path):
        """A12 parity: the rolling EDA feature frame must be identical
        under batch and availableNow streaming (incl. the percentile and
        regr_slope aggregates, which carry non-trivial streaming state)."""
        from physioview_spark.streaming import streaming_eda_features

        rng = np.random.default_rng(9)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        n = 4 * 600  # 10 min at 4 Hz
        rows = []
        for s in range(2):
            phasic = np.abs(rng.standard_normal(n)) * 0.1
            tonic = 2.0 + 0.3 * np.sin(np.arange(n) / 300.0) + 0.1 * s
            for i in range(n):
                rows.append((f"s{s}",
                             pd.Timestamp(base + np.timedelta64(
                                 int(i * 1e6 / 4), "us")),
                             float(phasic[i]), float(tonic[i])))
            rows.append((f"s{s}",
                         pd.Timestamp(base + np.timedelta64(2, "h")),
                         0.0, 0.0))  # watermark-advancing sentinel
        sch = "subject_id string, ts timestamp, phasic double, tonic double"
        pdf = pd.DataFrame(rows, columns=["subject_id", "ts", "phasic",
                                          "tonic"])
        p = str(tmp_path / "eda")
        spark.createDataFrame(pdf, sch).repartition(3).write.parquet(p)

        got_b = streaming_eda_features(spark.read.parquet(p))
        q = (streaming_eda_features(
                spark.readStream.schema(sch).parquet(p))
             .writeStream.format("memory").queryName("eda_feat")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got_s = spark.table("eda_feat")

        cut = F.lit(pd.Timestamp("2024-01-01 00:10:00"))
        b = (got_b.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        s = (got_s.where(F.col("window_start") < cut)
             .orderBy("subject_id", "window_start").toPandas())
        assert len(b) == len(s) > 10
        assert list(b.columns) == list(s.columns)
        for c in b.columns:
            if b[c].dtype == object or "window" in c or c == "subject_id":
                assert (b[c].values == s[c].values).all(), c
            else:
                np.testing.assert_allclose(
                    b[c].values.astype(float), s[c].values.astype(float),
                    rtol=1e-9, err_msg=c)

    def test_seconds_hr_harmonic_mean(self, spark):
        from physioview_spark.streaming import streaming_seconds_hr

        # two beats with known IBIs inside one centered window
        pdf = pd.DataFrame({
            "subject_id": ["a", "a", "a"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:10.0", "2024-01-01 00:00:10.8",
                 "2024-01-01 00:00:11.6"]),
            "ibi_ms": [None, 800.0, 800.0],
        })
        df = spark.createDataFrame(pdf)
        out = streaming_seconds_hr(df).toPandas()
        row = out[out["second"] == pd.Timestamp("2024-01-01 00:00:10")]
        assert not row.empty
        # hr = 75 bpm for both beats -> harmonic mean = 75
        assert abs(row.iloc[0]["harmonic_hr"] - 75.0) < 1e-9


class TestStatefulIbi:
    def test_state_carries_across_microbatches(self, spark, tmp_path):
        from physioview_spark.streaming import streaming_ibis

        # two parquet files -> maxFilesPerTrigger=1 forces 2 micro-batches
        base = pd.Timestamp("2024-01-01 00:00:00")
        f1 = pd.DataFrame({
            "subject_id": ["a"] * 3,
            "ts": [base + pd.Timedelta(seconds=s) for s in (0.0, 0.8, 1.7)],
        })
        f2 = pd.DataFrame({
            "subject_id": ["a"] * 2,
            "ts": [base + pd.Timedelta(seconds=s) for s in (2.5, 3.1)],
        })
        p = str(tmp_path / "beats")
        sch = "subject_id string, ts timestamp"
        spark.createDataFrame(f1, sch).coalesce(1).write.mode(
            "append").parquet(p)
        spark.createDataFrame(f2, sch).coalesce(1).write.mode(
            "append").parquet(p)

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        q = (streaming_ibis(stream)
             .writeStream.format("memory").queryName("ibi_stream")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got = (spark.table("ibi_stream").orderBy("ts").toPandas())

        batch = streaming_ibis(spark.read.parquet(p)).orderBy("ts").toPandas()
        # same IBIs whether the 2.5s beat arrived in a later micro-batch
        # (needs the carried last-beat state) or all at once
        np.testing.assert_allclose(
            got["ibi_ms"].values.astype(float),
            batch["ibi_ms"].values.astype(float), equal_nan=True)
        assert np.isnan(got["ibi_ms"].iloc[0])
        assert list(got["ibi_ms"].iloc[1:]) == [800.0, 900.0, 800.0, 600.0]


class TestDocCuration:
    def test_batch_vs_stream_dedup_and_gate(self, spark, tmp_path):
        from physioview_spark.streaming import streaming_doc_curation

        sch = "doc_id long, ingest_ts timestamp, text string"
        base = pd.Timestamp("2024-01-01 00:00:00")
        mk = lambda i, s, t: (i, base + pd.Timedelta(seconds=s), t)
        good = ("the data and the pipeline of it is in that table and "
                "it is good that the text is long enough to pass the bar")
        rows = [
            mk(0, 0, good),
            mk(1, 1, good + " extra"),          # distinct text
            mk(2, 2, good),                     # duplicate of 0
            mk(3, 3, "12345!!!"),                # low quality -> gated
            mk(4, 240, good),                   # later duplicate of 0
        ]
        p = str(tmp_path / "docs")
        spark.createDataFrame(pd.DataFrame(
            rows, columns=["doc_id", "ingest_ts", "text"]), sch
        ).coalesce(1).write.parquet(p)

        batch = streaming_doc_curation(spark.read.parquet(p)).toPandas()

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        out = streaming_doc_curation(stream)
        q = (out.writeStream.format("memory").queryName("doc_curation")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got = spark.table("doc_curation").toPandas()

        # same surviving set of unique texts, exactly one row per hash,
        # low-quality doc gated out in both modes
        assert sorted(got["text_hash"]) == sorted(batch["text_hash"])
        assert got["text_hash"].is_unique and batch["text_hash"].is_unique
        assert 3 not in set(got["doc_id"]) | set(batch["doc_id"])
        assert len(got) == 2


class TestStreamingNearDup:
    def test_batch_vs_stream_lsh_parity(self, spark, tmp_path):
        """Incremental MinHash-LSH over two micro-batches must emit
        exactly the candidate-pair set the batch operator finds on the
        full corpus — including pairs whose members arrived in DIFFERENT
        micro-batches (the accumulating band-table join)."""
        from physioview_spark.llm.dedup import minhash_lsh_candidates
        from physioview_spark.streaming import streaming_near_dup_lsh

        base = ("the quick brown fox jumps over the lazy dog while the "
                "rain in spain falls mainly on the plain every day")
        near = base.replace("lazy dog", "sleepy dog")  # near-dup of 0
        sch = "doc_id long, text string"
        f1 = [(0, base), (1, "completely unrelated text about spark "
                             "catalyst plans and parquet column pruning")]
        f2 = [(2, base),          # exact dup of 0, later micro-batch
              (3, near),          # near dup of 0, later micro-batch
              (4, "another standalone document mentioning duckdb "
                  "oracles and window aggregation semantics")]
        p = str(tmp_path / "docs")
        spark.createDataFrame(f1, sch).coalesce(1).write.mode(
            "append").parquet(p)
        spark.createDataFrame(f2, sch).coalesce(1).write.mode(
            "append").parquet(p)

        corpus = spark.read.parquet(p)
        want = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_candidates(corpus).collect()}
        assert (0, 2) in want  # cross-batch exact dup must be a candidate

        state = str(tmp_path / "state")
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        q = (streaming_near_dup_lsh(stream, state)
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        await_stream(q, 120)

        got = {(r["id_a"], r["id_b"]) for r in
               spark.read.parquet(state + "/pairs").collect()}
        assert got == want
        # each unordered pair emitted exactly once across all batches
        assert spark.read.parquet(state + "/pairs").count() == len(got)
        drop_near_dup_state(spark, state)

    def test_three_batches_with_retry_exactly_once(self, spark, tmp_path):
        """foreachBatch redelivers a batch_id after a failure; the state
        writes are keyed on batch_id (pairs: dynamic partition
        overwrite; bands: append guarded by partition presence), so a
        redelivered micro-batch changes NOTHING — across three
        micro-batches with batch 1 delivered twice, the emitted pairs
        still equal the batch operator on the full corpus, each exactly
        once, and the band table holds one copy of each batch's bands."""
        from physioview_spark.llm.dedup import minhash_lsh_candidates
        from physioview_spark.streaming.documents import _band_table_name

        base = ("the quick brown fox jumps over the lazy dog while the "
                "rain in spain falls mainly on the plain every day")
        sch = "doc_id long, text string"
        batches = [
            [(0, base), (1, "unrelated text about catalyst plans")],
            [(2, base.replace("lazy dog", "sleepy dog")),
             (3, "standalone duckdb oracle windowing notes")],
            [(4, base), (5, "third batch filler document entirely")],
        ]
        frames = [spark.createDataFrame(b, sch) for b in batches]
        state = str(tmp_path / "state")
        proc = near_dup_batch_processor(state)
        proc(frames[0], 0)
        proc(frames[1], 1)
        proc(frames[1], 1)  # simulated retry: must be a no-op
        proc(frames[2], 2)

        corpus = frames[0].unionByName(frames[1]).unionByName(frames[2])
        want = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_candidates(corpus).collect()}
        assert {(0, 4), (0, 2)} <= want  # cross-batch dups in play
        pairs = spark.read.parquet(state + "/pairs")
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == want
        assert pairs.count() == len(got)  # no duplicate emissions
        bands = spark.read.table(_band_table_name(state))
        per_batch = {r["batch_id"]: r["n"] for r in
                     bands.groupBy("batch_id").agg(
                         F.count(F.lit(1)).alias("n")).collect()}
        assert set(per_batch) == {0, 1, 2}  # one copy per batch, no dup
        # the accumulated side is a bucketed scan: the state join needs
        # no Exchange over previously-written bands
        assert "bucket" in bands._jdf.queryExecution().executedPlan() \
            .toString().lower()
        drop_near_dup_state(spark, state)

    def test_compaction_preserves_pairs_and_bucketing(self, spark,
                                                      tmp_path):
        """Folding finalized partitions into one (the periodic
        small-file maintenance) must not change what later micro-batches
        emit: after compacting batches 0-1, a new batch still finds its
        cross-batch near-dups against the consolidated state, and the
        table keeps its bucketing spec."""
        from physioview_spark.llm.dedup import minhash_lsh_candidates
        from physioview_spark.streaming.documents import (
            _band_table_name, compact_near_dup_state,
        )

        base = ("the quick brown fox jumps over the lazy dog while the "
                "rain in spain falls mainly on the plain every day")
        sch = "doc_id long, text string"
        batches = [
            [(0, base), (1, "unrelated text about catalyst plans")],
            [(2, "standalone duckdb oracle windowing notes")],
            [(3, base.replace("lazy dog", "sleepy dog"))],
            [(4, base)],  # near-dups 0 (compacted) and 3 (live)
        ]
        frames = [spark.createDataFrame(b, sch) for b in batches]
        state = str(tmp_path / "state")
        proc = near_dup_batch_processor(state)
        for i in range(3):
            proc(frames[i], i)
        compact_near_dup_state(spark, state, upto_batch_id=1)
        bands = spark.read.table(_band_table_name(state))
        assert {r["batch_id"] for r in
                bands.select("batch_id").distinct().collect()} == {1, 2}
        proc(frames[3], 3)

        corpus = frames[0]
        for f in frames[1:]:
            corpus = corpus.unionByName(f)
        want = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_candidates(corpus).collect()}
        got = {(r["id_a"], r["id_b"]) for r in
               spark.read.parquet(state + "/pairs").collect()}
        assert got == want and (0, 4) in got  # pre-compaction member
        assert "bucket" in (
            spark.read.table(_band_table_name(state))
            ._jdf.queryExecution().executedPlan().toString().lower())
        drop_near_dup_state(spark, state)


class TestAwaitStream:
    def test_timeout_raises_not_empty_frame(self, spark):
        """The r05 regression class: a stream that has not terminated by
        the deadline must RAISE (so the harness records an error), never
        fall through to a partially-populated sink. A rate source with no
        terminating trigger is deterministically still running."""
        src = (spark.readStream.format("rate")
               .option("rowsPerSecond", 1).load())
        q = (src.writeStream.format("memory").queryName("never_ends")
             .outputMode("append").start())
        try:
            with pytest.raises(TimeoutError):
                await_stream(q, 0.5)
            assert not q.isActive  # await_stream stopped it
        finally:
            if q.isActive:
                q.stop()


class TestStreamingSemanticDedup:
    def test_three_batches_retry_and_batch_parity(self, spark, tmp_path):
        """Streaming semantic dedup over three micro-batches (batch 1
        redelivered once) must equal the batch operator: per-batch
        decisions match sequential semantic_dedup_delta against the
        growing prefix, and the union of per-batch keeps equals
        semantic_dedup over the full prefix union (ids increase with
        arrival order)."""
        import numpy as np

        from physioview_spark.llm import similarity
        from physioview_spark.streaming.embeddings import (
            _vector_table_name, drop_semantic_state,
            semantic_dedup_batch_processor,
        )

        rng = np.random.RandomState(3)
        base = rng.randn(9, 8)

        def jit(i, eps=0.01):
            return [float(x) for x in base[i] + eps * rng.randn(8)]

        def vec(i):
            return [float(x) for x in base[i]]

        sch = "vec_id long, embedding array<float>"
        batches = [
            [(0, vec(0)), (1, vec(1)), (2, vec(2))],
            [(10, jit(0)), (11, vec(3)), (12, jit(3))],  # 10 dups 0;
            [(20, jit(1)), (21, vec(4)), (22, jit(4))],  # 12 dups 11...
        ]
        frames = [spark.createDataFrame(b, sch) for b in batches]
        cents = [vec(i) for i in range(0, 9, 3)]
        state = str(tmp_path / "semstate")
        proc = semantic_dedup_batch_processor(state, cents,
                                              threshold=0.95)
        proc(frames[0], 0)
        proc(frames[1], 1)
        proc(frames[1], 1)  # simulated retry: must be a no-op
        proc(frames[2], 2)

        got = spark.read.parquet(state + "/decisions")
        assert got.count() == 9  # one decision per vector, no dups
        by_id = {r["vec_id"]: r for r in got.collect()}
        # sequential reference: delta against the growing prefix
        prefix = None
        for f in frames:
            ref = similarity.semantic_dedup_delta(
                f, prefix if prefix is not None
                else spark.createDataFrame([], sch),
                cents, threshold=0.95).collect()
            for r in ref:
                g = by_id[r["vec_id"]]
                assert (g["decision"], g["match_id"], g["sim"]) == \
                    (r["decision"], r["match_id"], r["sim"])
            prefix = f if prefix is None else prefix.unionByName(f)
        # union parity with the batch operator over the full prefix
        batch_keep = {r["vec_id"] for r in similarity.semantic_dedup(
            prefix, cents, threshold=0.95).collect()}
        stream_keep = {i for i, r in by_id.items()
                       if r["decision"] == "keep"}
        assert stream_keep == batch_keep
        # one state copy per batch; accumulated side is a bucketed scan
        vecs = spark.read.table(_vector_table_name(state))
        per_batch = {r["batch_id"] for r in
                     vecs.select("batch_id").distinct().collect()}
        assert per_batch == {0, 1, 2}
        assert vecs.count() == 9
        drop_semantic_state(spark, state)


def test_semantic_state_compaction_preserves_decisions(spark, tmp_path):
    """Compacting vector-state partitions 0..1 into one consolidated
    partition must not change any later batch's decisions: replay a
    4th batch after compaction and compare against an uncompacted
    twin stream."""
    import numpy as np

    from physioview_spark.llm import similarity  # noqa: F401
    from physioview_spark.streaming.embeddings import (
        _vector_table_name, compact_semantic_state, drop_semantic_state,
        semantic_dedup_batch_processor,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(8, 8)
    sch = "vec_id long, embedding array<float>"

    def vec(i):
        return [float(x) for x in base[i]]

    def jit(i):
        return [float(x) for x in base[i] + 0.01 * rng.randn(8)]

    batches = [
        [(0, vec(0)), (1, vec(1))],
        [(10, vec(2)), (11, vec(3))],
        [(20, jit(0)), (21, vec(4))],
    ]
    b4 = [(30, jit(2)), (31, jit(4)), (32, vec(5))]
    cents = [vec(i) for i in range(0, 8, 2)]
    frames = [spark.createDataFrame(b, sch) for b in batches]
    f4 = spark.createDataFrame(b4, sch)

    outs = {}
    for mode in ("plain", "compacted"):
        state = str(tmp_path / mode)
        proc = semantic_dedup_batch_processor(state, cents,
                                              threshold=0.95)
        for i, f in enumerate(frames):
            proc(f, i)
        if mode == "compacted":
            compact_semantic_state(spark, state, upto_batch_id=1)
            vecs = spark.read.table(_vector_table_name(state))
            ids = {r["batch_id"] for r in
                   vecs.select("batch_id").distinct().collect()}
            assert ids == {1, 2}  # 0 folded into 1, live batch intact
            assert vecs.count() == 6
        proc(f4, 3)
        outs[mode] = sorted(map(tuple,
                            spark.read.parquet(state + "/decisions")
                            .where(F.col("batch_id") == 3)
                            .drop("batch_id").collect()))
        drop_semantic_state(spark, state)
    assert outs["plain"] == outs["compacted"]
    assert len(outs["plain"]) == 3


def test_semantic_state_compaction_crash_recovery(spark, tmp_path):
    """A crash between compaction's drop-live and rewrite-live (the
    r08 ADVICE window) must NOT make the next micro-batch treat the
    accumulated corpus as empty: the processor finds the complete
    staging copy and finishes the swap, so a duplicate of a batch-0
    vector is still dropped."""
    import numpy as np

    from physioview_spark.streaming.embeddings import (
        _state_writer, _vector_table_name, drop_semantic_state,
        semantic_dedup_batch_processor,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(6, 8)
    sch = "vec_id long, embedding array<float>"

    def vec(i):
        return [float(x) for x in base[i]]

    def jit(i):
        return [float(x) for x in base[i] + 0.01 * rng.randn(8)]

    cents = [vec(i) for i in range(0, 6, 2)]
    state_dir = str(tmp_path / "crashstate")
    proc = semantic_dedup_batch_processor(state_dir, cents,
                                          threshold=0.95)
    proc(spark.createDataFrame([(0, vec(0)), (1, vec(1))], sch), 0)
    proc(spark.createDataFrame([(10, vec(2))], sch), 1)

    # simulate the crash: replay compaction's steps and stop right
    # after the live table is dropped (staging written, live gone)
    import os

    table = _vector_table_name(state_dir)
    staging = table + "_compact"
    staging_path = os.path.join(state_dir, "vectors_compact")
    write = _state_writer(8)
    src = spark.read.table(table)
    consolidated = src.withColumn("batch_id", F.lit(1))
    write(consolidated, staging, staging_path)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert not spark.catalog.tableExists(table)  # the lethal window

    # next micro-batch: 20 duplicates vector 0 from the pre-crash state
    proc(spark.createDataFrame([(20, jit(0)), (21, vec(3))], sch), 2)
    dec = {r["vec_id"]: r["decision"] for r in
           spark.read.parquet(state_dir + "/decisions")
           .where(F.col("batch_id") == 2).collect()}
    assert dec[20] == "drop_corpus_dup"  # state was recovered, not empty
    assert dec[21] == "keep"
    # the swap finished: live table holds all state, staging is gone
    assert spark.catalog.tableExists(table)
    assert not spark.catalog.tableExists(staging)
    vecs = spark.read.table(table)
    assert vecs.count() == 5
    drop_semantic_state(spark, state_dir)


def test_near_dup_state_compaction_crash_recovery(spark, tmp_path):
    """Same window for the band table: after an interrupted
    compaction the next micro-batch must still pair against
    pre-crash members."""
    import os

    from physioview_spark.streaming.documents import (
        _band_table_name, _band_writer, drop_near_dup_state,
        near_dup_batch_processor,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    sch = "doc_id long, text string"
    state_dir = str(tmp_path / "ndcrash")
    proc = near_dup_batch_processor(state_dir)
    proc(spark.createDataFrame([(0, base), (1, "totally different "
                                              "words here")], sch), 0)

    table = _band_table_name(state_dir)
    staging = table + "_compact"
    write = _band_writer(8)
    consolidated = spark.read.table(table).withColumn(
        "batch_id", F.lit(0))
    write(consolidated, staging,
          os.path.join(state_dir, "bands_compact"))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert not spark.catalog.tableExists(table)

    proc(spark.createDataFrame([(5, base)], sch), 1)  # dup of doc 0
    pairs = {(r["id_a"], r["id_b"]) for r in
             spark.read.parquet(state_dir + "/pairs")
             .where(F.col("batch_id") == 1).collect()}
    assert (0, 5) in pairs  # pre-crash member found via recovery
    assert spark.catalog.tableExists(table)
    assert not spark.catalog.tableExists(staging)
    drop_near_dup_state(spark, state_dir)


class TestStreamingSessions:
    def test_session_bounds_batch_vs_stream(self, spark, tmp_path):
        """operators/sessions.session_bounds claims the identical
        groupBy runs under readStream with a watermark — prove it: the
        streamed session windows (availableNow over a parquet dir)
        must equal the batch bounds row-for-row."""
        import datetime as dt

        from physioview_spark.operators import sessions

        base = dt.datetime(2024, 1, 1)
        rows = []
        for uid in range(4):
            t = base + dt.timedelta(minutes=uid)
            for burst in range(3):
                for j in range(5):
                    rows.append((uid, t))
                    t += dt.timedelta(seconds=40)
                t += dt.timedelta(minutes=30)  # gap > 10 min: new session
        sch = "user_id long, ts timestamp"  # watermarks require TIMESTAMP, not NTZ
        p = str(tmp_path / "sess_events")
        spark.createDataFrame(rows, sch).repartition(3).write.parquet(p)

        batch = sessions.session_bounds(
            spark.read.parquet(p), "10 minutes")
        stream_in = (spark.readStream.schema(sch).parquet(p)
                     .withWatermark("ts", "1 minute"))
        q = (sessions.session_bounds(stream_in, "10 minutes")
             .writeStream.format("memory").queryName("sess_stream")
             .outputMode("complete").trigger(availableNow=True).start())
        await_stream(q, 120)
        cols = ["user_id", "session_start", "session_end", "n_events"]
        got = _collect_sorted(spark.table("sess_stream"), cols)
        want = _collect_sorted(batch, cols)
        assert got == want and len(want) == 12  # 4 users x 3 bursts


class TestLateDataWatermark:
    """VERDICT r16 item 3: the parity tests above feed ordered
    availableNow micro-batches; these pin the WATERMARK path — rows
    arriving out-of-order within the watermark are included, a
    beyond-watermark straggler is dropped, and cross-batch window
    closure emits each window exactly once — against the documented
    semantics, with one parquet file per micro-batch
    (maxFilesPerTrigger=1, mtimes spaced to fix replay order)."""

    @staticmethod
    def _write_microbatches(path, batches, columns):
        """One single-file parquet per micro-batch; the file source
        processes files oldest-mtime-first, so spaced utimes make batch
        i exactly micro-batch i."""
        import os
        import time

        os.makedirs(path, exist_ok=True)
        now = time.time()
        for i, rows in enumerate(batches):
            f = os.path.join(path, f"b{i}.parquet")
            pdf = pd.DataFrame(rows, columns=columns)
            for c in pdf.columns:
                # pandas defaults to TIMESTAMP(NANOS), which Spark
                # reads as plain INT64 — write MICROS
                if pd.api.types.is_datetime64_any_dtype(pdf[c]):
                    pdf[c] = pdf[c].astype("datetime64[us]")
            pdf.to_parquet(f, index=False)
            t = now - 600 + i * 30
            os.utime(f, (t, t))
        return path

    def test_segment_sqa_late_and_straggler(self, spark, tmp_path):
        """Windowed aggregation (streaming_segment_sqa, watermark 2 min,
        60 s tumbling windows): within-watermark disorder and a late
        next-batch row land in their window; a straggler whose WINDOW
        END is behind the watermark is dropped. The stream must equal
        the batch twin on (all rows minus the dropped straggler) and
        differ from the batch twin on all rows — proving the drop is
        real, not missing input."""
        from physioview_spark.streaming import streaming_segment_sqa

        base = pd.Timestamp("2024-01-01 00:00:00")
        mk = lambda sec: ("s1", base + pd.Timedelta(seconds=sec), 1.0, None)
        straggler = mk(50)
        batches = [
            # W1 rows deliberately unordered + an advancing row at
            # 02:30 -> watermark after b0 = 00:30 (< W1's end: open)
            [mk(30), mk(10), mk(20), mk(150)],
            # late W1 row at 00:40 — W1 end (01:00) is ahead of the
            # b0 watermark (00:30), so it MUST be included; the
            # advancing row moves the watermark to 02:00, closing W1
            [mk(40), mk(240)],
            # advance-only batch: Spark filters LATE rows against the
            # PREVIOUS batch's watermark (watermarkForLateEvents trails
            # watermarkForEviction by one batch — one batch of grace),
            # so the straggler must arrive a full batch after the
            # watermark passed its window; W1 is emitted here (=4)
            [mk(300)],
            # straggler at 00:50: W1 end (01:00) is behind even the
            # late-events watermark (02:00) -> dropped
            # (numRowsDroppedByWatermark); sentinel flushes the rest
            [straggler, mk(3600)],
        ]
        cols = ["subject_id", "ts", "beat", "artifact"]
        p = self._write_microbatches(str(tmp_path / "late_seg"), batches,
                                     cols)

        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        q = (streaming_segment_sqa(stream)
             .writeStream.format("memory").queryName("late_seg")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        cut = F.lit(base + pd.Timedelta(minutes=10))
        cols_out = ["subject_id", "segment_start", "n_detected",
                    "n_artifact", "invalid"]
        got = _collect_sorted(
            spark.table("late_seg").where(F.col("segment_start") < cut),
            cols_out)

        all_rows = [r for b in batches for r in b]
        kept_rows = [r for r in all_rows if r is not straggler]
        mk_batch = lambda rows: streaming_segment_sqa(
            spark.createDataFrame(pd.DataFrame(rows, columns=cols),
                                  SCHEMA))
        want = _collect_sorted(
            mk_batch(kept_rows).where(F.col("segment_start") < cut),
            cols_out)
        with_straggler = _collect_sorted(
            mk_batch(all_rows).where(F.col("segment_start") < cut),
            cols_out)

        assert got == want
        assert got != with_straggler  # the straggler was really dropped
        w1 = [r for r in got if r[1] == base][0]
        assert w1[2] == 4  # 3 disordered b0 rows + 1 late b1 row, no b2

    def test_doc_dedup_within_watermark_horizon(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark (streaming_doc_curation,
        watermark 10 min): a duplicate arriving inside the horizon of
        its first occurrence is dropped; once the watermark passes
        first-seen + delay the key's state is evicted and a LATER
        duplicate is emitted again — the documented bounded-state
        behavior (streaming/documents.py module docstring), which the
        batch pass over the accumulated corpus is specified to mop up."""
        from physioview_spark.streaming import streaming_doc_curation

        base = pd.Timestamp("2024-01-01 10:00:00")
        good = ("the data and the pipeline of it is in that table and "
                "it is good that the text is long enough to pass the bar")
        mk = lambda i, m, t: (i, base + pd.Timedelta(minutes=m), t)
        batches = [
            # A first-seen at 10:00; advance to 10:05 -> wm 09:55
            [mk(0, 0, good), mk(1, 5, good + " extra one")],
            # dup of A at 10:06: state live (wm 09:55 < 10:00+10min)
            # -> dropped; advance to 10:30 -> wm 10:20 > 10:10
            [mk(2, 6, good), mk(3, 30, good + " extra two")],
            # advance-only batch: state eviction runs against the
            # CURRENT batch's watermark (10:20 > A's 10:10 expiry ->
            # A evicted here), while the next batch's late filter uses
            # this watermark — the same one-batch grace as the
            # aggregation test
            [mk(5, 35, good + " extra three")],
            # dup of A at 10:25: state gone, and 10:25 clears the
            # late-events watermark (10:20) -> emitted AGAIN
            [mk(4, 25, good)],
        ]
        cols = ["doc_id", "ingest_ts", "text"]
        sch = "doc_id long, ingest_ts timestamp, text string"
        p = self._write_microbatches(str(tmp_path / "late_docs"),
                                     batches, cols)

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        q = (streaming_doc_curation(stream)
             .writeStream.format("memory").queryName("late_docs")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got = spark.table("late_docs").toPandas()

        assert sorted(got["doc_id"]) == [0, 1, 3, 4, 5]
        a_hash = got.set_index("doc_id")["text_hash"][0]
        assert (got["text_hash"] == a_hash).sum() == 2  # doc 0 and doc 4

    def test_stateful_extended_straggler_no_duplicate_window(
            self, spark, tmp_path):
        """Stateful twin (streaming_eda_features_extended, keyed window
        state + EventTimeTimeout): stateful operators filter late ROWS
        against the watermark (stricter than the aggregation's
        window-end rule) — a within-watermark out-of-order row lands in
        its open window, and a beyond-watermark straggler must be
        dropped BEFORE the state function, never resurrecting a
        timed-out window key into a duplicate emission."""
        from physioview_spark.streaming import (
            streaming_eda_features_extended,
        )

        base = pd.Timestamp("2024-01-01 00:00:00")
        mk = lambda sec: ("s1", base + pd.Timedelta(seconds=sec),
                          float(np.sin(sec)))
        straggler = mk(50)
        batches = [
            # ten W0 samples (disordered) + advance to 02:30 -> wm 00:30
            [mk(9), mk(0), *[mk(s) for s in (1, 2, 3, 4, 5, 6, 7, 8)],
             mk(150)],
            # out-of-order row at 00:45 >= wm -> included in W0 state;
            # advance to 05:00 -> wm 03:00 > W0's timeout (01:00)
            [mk(45), mk(300)],
            # advance-only batch: W0's EventTimeTimeout fires here
            # (eviction watermark 03:00), emitting n=11; the NEXT
            # batch's late filter uses this batch's watermark (the
            # one-batch grace documented in the aggregation test)
            [mk(360)],
            # straggler at 00:50 < late-events watermark 03:00 ->
            # filtered before the state function, so the timed-out W0
            # key is NOT resurrected; sentinel flushes open windows
            [straggler, mk(3600)],
        ]
        cols = ["subject_id", "ts", "phasic"]
        sch = "subject_id string, ts timestamp, phasic double"
        p = self._write_microbatches(str(tmp_path / "late_ext"),
                                     batches, cols)

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(p))
        q = (streaming_eda_features_extended(
                stream, value_cols=["phasic"], window_seconds=60,
                watermark="2 minutes")
             .writeStream.format("memory").queryName("late_ext")
             .outputMode("append").trigger(availableNow=True).start())
        await_stream(q, 120)
        got = spark.table("late_ext").toPandas()

        w0 = got[got["window_start"] == base]
        assert len(w0) == 1  # exactly one emission, no resurrection
        assert int(w0["n"].iloc[0]) == 11  # 10 from b0 + the 00:45 row

        # value parity: batch twin on (all rows minus the straggler)
        all_rows = [r for b in batches for r in b]
        kept = [r for r in all_rows if r is not straggler]
        want = streaming_eda_features_extended(
            spark.createDataFrame(pd.DataFrame(kept, columns=cols), sch),
            value_cols=["phasic"], window_seconds=60,
        ).toPandas()
        want_w0 = want[want["window_start"] == base]
        for c in want_w0.columns:
            if want_w0[c].dtype == object or "window" in c:
                assert list(want_w0[c]) == list(w0[c]), c
            else:
                np.testing.assert_allclose(
                    w0[c].to_numpy(dtype=float),
                    want_w0[c].to_numpy(dtype=float),
                    rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=c)
