"""Property-based tests (hypothesis) for the invariants SURVEY §5 implies.

NumPy-level kernels get wide random sweeps; Spark-level operators get a
few examples each (session round-trips are expensive) with the pandas
reference implementation as the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------- numpy level

@st.composite
def beat_trains(draw, min_beats=8, max_beats=120):
    """Plausible beat index trains: 40-200 bpm at fs=100 with jitter."""
    n = draw(st.integers(min_beats, max_beats))
    fs = 100.0
    ibis = draw(st.lists(
        st.floats(min_value=0.3, max_value=1.5, allow_nan=False),
        min_size=n, max_size=n))
    ix = np.cumsum(np.array([1.0] + ibis) * fs).astype(np.int64)
    return ix, fs


@pytest.mark.filterwarnings("error::RuntimeWarning")
class TestCorrectionProperties:
    # numpy RuntimeWarnings are errors here: the correction kernel's
    # empty-FIFO paths must stay explicitly guarded (VERDICT r15 item 8)
    @settings(max_examples=40, deadline=None)
    @given(beat_trains())
    def test_corrected_beats_monotone_and_bounded(self, train):
        from physioview_spark.functions.kernels_correction import (
            correct_interval,
        )

        ix, fs = train
        _, _, corrected = correct_interval(ix, fs)
        beats = corrected["beat"]
        assert np.all(np.diff(beats) > 0), "corrected beats not monotone"
        # corrected beats stay inside the original recording span
        assert beats[0] >= ix[0] - int(2.0 * fs)
        assert beats[-1] <= ix[-1] + int(2.0 * fs)

    @settings(max_examples=40, deadline=None)
    @given(beat_trains())
    def test_artifact_indices_subset_of_beats(self, train):
        from physioview_spark.functions.kernels_artifacts import (
            identify_artifacts,
        )

        ix, fs = train
        for method in ("hegarty", "cbd", "both"):
            arts = identify_artifacts(ix, fs, method=method)
            assert set(arts).issubset(set(ix)), method


class TestDspProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(64, 2048), st.integers(1, 5))
    def test_fourier_resample_roundtrip(self, n, factor):
        from physioview_spark.dsp.apply import fourier_resample

        rng = np.random.default_rng(n)
        # band-limit: keep content below Nyquist/factor so the down-leg
        # is information-preserving
        x = np.zeros(n)
        for k in range(1, max(2, n // (4 * factor)), 3):
            x += np.sin(2 * np.pi * k * np.arange(n) / n + k)
        up = fourier_resample(x, n * factor)
        back = fourier_resample(up, n)
        np.testing.assert_allclose(back, x, atol=1e-8)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(16, 512))
    def test_moving_average_w1_identity(self, n):
        from physioview_spark.dsp.apply import moving_average

        x = np.random.default_rng(n).normal(size=n)
        np.testing.assert_allclose(moving_average(x, 1), x)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(100, 1000), st.integers(2, 8))
    def test_decimate_preserves_length_contract(self, n, factor):
        from physioview_spark.dsp.apply import decimate_fir

        x = np.random.default_rng(7).normal(size=n)
        y = decimate_fir(x, factor)
        assert len(y) == int(np.ceil(n / factor))


# ------------------------------------------------------------- spark level

@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 40))
    n_right = draw(st.integers(1, 40))
    left_keys = sorted(draw(st.lists(
        st.integers(0, 10_000), min_size=n_left, max_size=n_left,
        unique=True)))
    right_keys = sorted(draw(st.lists(
        st.integers(0, 10_000), min_size=n_right, max_size=n_right,
        unique=True)))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tol = draw(st.sampled_from([None, 5.0, 100.0]))
    return left_keys, right_keys, direction, tol


class TestAsofVsPandas:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(asof_case())
    def test_matches_merge_asof(self, spark, case):
        from physioview_spark.operators.asof import asof_join

        left_keys, right_keys, direction, tol = case
        lp = pd.DataFrame({"k": np.array(left_keys, dtype=np.float64)})
        rp = pd.DataFrame({
            "k": np.array(right_keys, dtype=np.float64),
            "v": np.arange(len(right_keys), dtype=np.float64),
        })
        expected = pd.merge_asof(
            lp, rp, on="k", direction=direction,
            tolerance=tol if tol is None else float(tol))

        sl = spark.createDataFrame(lp.assign(subject_id="a"))
        sr = spark.createDataFrame(rp.assign(subject_id="a"))
        got = (asof_join(sl, sr, on="k", by="subject_id",
                         direction=direction, tolerance=tol)
               .orderBy("k").toPandas())
        np.testing.assert_allclose(
            got["v_r"].to_numpy(dtype=float),
            expected["v"].to_numpy(dtype=float),
            equal_nan=True,
            err_msg=f"direction={direction} tol={tol}")


@st.composite
def asof_tie_case(draw):
    """Small key domains force duplicate right timestamps; carried
    values (and NULLs) exercise the struct-payload tie carry."""
    n_left = draw(st.integers(1, 6))
    n_right = draw(st.integers(2, 12))
    opt_val = st.one_of(st.none(), st.integers(0, 4).map(float))
    left_keys = draw(st.lists(st.integers(0, 9).map(float),
                              min_size=n_left, max_size=n_left,
                              unique=True))
    rows = draw(st.lists(
        st.tuples(st.integers(0, 9).map(float), opt_val, opt_val),
        min_size=n_right, max_size=n_right))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    return left_keys, rows, direction


def _tie_winner(rows):
    """The documented asof tie rule: largest orderable carried tuple,
    struct comparison field order (v, u, key), NULL fields smallest."""
    def key(r):
        k, v, u = r
        return ((v is not None, v if v is not None else 0.0),
                (u is not None, u if u is not None else 0.0), k)
    return max(rows, key=key)


def _asof_model(lk, rows, direction):
    back = [r for r in rows if r[0] <= lk]
    fwd = [r for r in rows if r[0] >= lk]
    b = f = None
    if back:
        mk = max(r[0] for r in back)
        b = _tie_winner([r for r in back if r[0] == mk])
    if fwd:
        mk = min(r[0] for r in fwd)
        f = _tie_winner([r for r in fwd if r[0] == mk])
    if direction == "backward":
        return b
    if direction == "forward":
        return f
    if b is None or f is None:
        return b if f is None else f
    return b if (lk - b[0]) <= (f[0] - lk) else f  # backward wins ties


class TestAsofTieSemantics:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(asof_tie_case())
    def test_tie_rule_matches_model(self, spark, case):
        """r14 struct-payload tie carry vs a pure-Python model of the
        documented rule — duplicate right keys AND NULL carried values,
        under a 7-way repartition scramble. Every carried column must
        come from the model's single winning row (merge_asof cannot
        oracle this: its tie pick is input-order-dependent)."""
        from physioview_spark.operators.asof import asof_join

        left_keys, rows, direction = case
        sl = spark.createDataFrame(
            [("a", k) for k in left_keys], "subject_id string, k double")
        sr = spark.createDataFrame(
            [("a", k, v, u) for k, v, u in rows],
            "subject_id string, k double, v double, u double")
        got = {r["k"]: (r["k_r"], r["v_r"], r["u_r"])
               for r in asof_join(sl, sr.repartition(7), on="k",
                                  by="subject_id",
                                  direction=direction).collect()}
        for lk in left_keys:
            want = _asof_model(lk, rows, direction)
            if want is None:
                assert got[lk] == (None, None, None), (lk, got[lk])
            else:
                assert got[lk] == want, (
                    f"left k={lk} direction={direction}: "
                    f"got {got[lk]}, model says {want}")

    def test_suffix_collision_guard(self, spark):
        from physioview_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [("a", 1.0, 0.0)], "subject_id string, k double, v_r double")
        right = spark.createDataFrame(
            [("a", 1.0, 2.0)], "subject_id string, k double, v double")
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right, on="k", by="subject_id")


@st.composite
def interp_case(draw):
    n_left = draw(st.integers(1, 8))
    n_right = draw(st.integers(1, 8))
    left_keys = draw(st.lists(st.integers(0, 40).map(float),
                              min_size=n_left, max_size=n_left,
                              unique=True))
    # unique right keys: interp_join's documented precondition
    right_keys = sorted(draw(st.lists(
        st.integers(0, 40).map(float), min_size=n_right,
        max_size=n_right, unique=True)))
    right_vals = draw(st.lists(st.integers(-50, 50).map(float),
                               min_size=n_right, max_size=n_right))
    return left_keys, right_keys, right_vals


def _interp_model(lk, xs, ys):
    """scipy interp1d(kind='linear', fill_value='extrapolate') without
    scipy: np.interp interior, edge-pair extrapolation outside."""
    if len(xs) == 1:
        return ys[0]
    if lk <= xs[0]:
        x0, x1, y0, y1 = xs[0], xs[1], ys[0], ys[1]
    elif lk >= xs[-1]:
        x0, x1, y0, y1 = xs[-2], xs[-1], ys[-2], ys[-1]
    else:
        return float(np.interp(lk, xs, ys))
    return y0 + (y1 - y0) * (lk - x0) / (x1 - x0)


class TestInterpVsModel:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(interp_case())
    def test_matches_interp1d_semantics(self, spark, case):
        """K22 interp_join vs the interp1d-extrapolate model: interior
        blending, exact-key hits, and edge-pair extrapolation on BOTH
        sides, randomized — including left keys outside the right range
        and coincident keys."""
        from physioview_spark.operators.asof import interp_join

        left_keys, xs, ys = case
        sl = spark.createDataFrame([("a", k) for k in left_keys],
                                   "subject_id string, k double")
        sr = spark.createDataFrame(
            [("a", x, y) for x, y in zip(xs, ys)],
            "subject_id string, k double, v double")
        got = {r["k"]: r["v_interp"]
               for r in interp_join(sl, sr.repartition(5), on="k",
                                    value_col="v",
                                    by="subject_id").collect()}
        for lk in left_keys:
            want = _interp_model(lk, xs, ys)
            assert got[lk] == pytest.approx(want, rel=1e-9, abs=1e-9), (
                f"k={lk}: got {got[lk]}, model {want} (xs={xs}, ys={ys})")


# ------------------------------------------- A2 expected-beat model test

def _hu(x, nd=0):
    """Spark F.round = BigDecimal HALF_UP on the double's SHORTEST repr
    (Double.toString); Python repr is the same shortest round-trip."""
    from decimal import ROUND_HALF_UP, Decimal

    if x is None:
        return None
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _med(vals):
    """Exact median, nulls dropped, None for empty — _arr_median's rule."""
    vals = sorted(v for v in vals if v is not None)
    if not vals:
        return None
    n = len(vals)
    return vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2.0


def _win_medians(rows, win=5):
    """5-beat forward windows over (artifact, hr) rows; artifact-free full
    windows only; a window of all-null HRs still yields one (None) entry —
    reference _window_medians semantics (SQA.py:1751-1764)."""
    out = []
    for i in range(len(rows)):
        w = rows[i:i + win]
        if len(w) == win and not any(a for a, _ in w):
            out.append(_med([h for _, h in w]))
    return out


def _missing_model(beats, arts, fs, seg_size):
    """Pure-python reference model of get_missing (SQA.py:503-629) with the
    CLAMPED last-segment end — the semantics get_missing's join-free
    tagged-window slice arithmetic must preserve observably."""
    import math

    seg_len = int(fs * seg_size)
    k = int(seg_size * 0.5)
    n_samples = beats[-1] + 1
    n_seg = math.ceil(n_samples / seg_len)
    hrs = [None] + [60000.0 / ((beats[j] - beats[j - 1]) / fs * 1000.0)
                    for j in range(1, len(beats))]

    seg_med, seg_n, last_med, last_n, first_med, first_n, det = (
        {}, {}, {}, {}, {}, {}, {})
    for s in range(1, n_seg + 1):
        st_, en = (s - 1) * seg_len, min(n_samples, s * seg_len)
        rows = [(arts[j], hrs[j]) for j in range(len(beats))
                if st_ <= beats[j] < s * seg_len]
        det[s] = len(rows)
        m = _win_medians(rows)
        seg_n[s], seg_med[s] = len(m), _med(m)
        lm = _win_medians([(arts[j], hrs[j]) for j in range(len(beats))
                           if st_ <= beats[j] < s * seg_len
                           and beats[j] >= en - k])
        last_n[s], last_med[s] = len(lm), _med(lm)
        fm = _win_medians([(arts[j], hrs[j]) for j in range(len(beats))
                           if st_ <= beats[j] < s * seg_len
                           and beats[j] < st_ + k])
        first_n[s], first_med[s] = len(fm), _med(fm)

    out, exp_hr = {}, None
    raw_expected = {}
    for s in range(1, n_seg + 1):
        if seg_n.get(s, 0) > 0:
            raw = seg_med[s]
        elif last_n.get(s - 1, 0) > 0:
            raw = last_med[s - 1]
        elif first_n.get(s + 1, 0) > 0:
            raw = first_med[s + 1]
        else:
            raw = None
        if raw is not None:
            exp_hr = raw
        f = None if exp_hr is None else _hu(exp_hr * (seg_size / 60.0))
        if s == n_seg and f is not None:
            sns = min(n_samples, s * seg_len) - (s - 1) * seg_len
            f = _hu(f * (sns / fs / seg_size))
        raw_expected[s] = f
    # leading backfill: first non-null at-or-after s
    for s in range(1, n_seg + 1):
        n_exp = next((raw_expected[t] for t in range(s, n_seg + 1)
                      if raw_expected[t] is not None), None)
        n_exp = None if n_exp is None else int(n_exp)
        # Spark/DuckDB GREATEST skip nulls: greatest(0, NULL) = 0, so a
        # null-expected segment reports 0 missing (and a null pct)
        n_miss = 0 if n_exp is None else max(0, n_exp - det[s])
        pct = (None if not n_exp
               else _hu(n_miss / n_exp * 100.0, 2))
        out[s] = (det[s], n_exp, n_miss, pct)
    return out


@st.composite
def sparse_beat_subjects(draw):
    """1-2 subjects of sparse beat rows over up to ~10 segments at fs=1,
    seg_size=10 — tiny hostile geometries: <5-beat segments, beat-free
    segments, all-artifact windows, 1-beat subjects, partial finals."""
    subjects = {}
    for sid in range(draw(st.integers(1, 2))):
        idx = sorted(draw(st.sets(st.integers(0, 95), min_size=1,
                                  max_size=40)))
        arts = [draw(st.booleans()) for _ in idx]
        subjects[f"s{sid}"] = (idx, arts)
    return subjects


class TestMissingModel:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(sparse_beat_subjects())
    def test_get_missing_matches_reference_model(self, spark, subjects):
        """get_missing == the pure-python reference loop on randomized
        sparse frames — pins the r15 rewrite (join-free half-slice bounds,
        merged detected counts, _seg_samples spine) against the CLAMPED
        reference semantics on geometries the sf tables never hit."""
        from physioview_spark.operators.metrics import get_missing

        rows = []
        for sid, (idx, arts) in subjects.items():
            for i, a in zip(idx, arts):
                rows.append((sid, i, 1.0, 1.0 if a else None))
        df = spark.createDataFrame(
            rows, "subject_id string, sample_idx long, beat double, "
                  "artifact double")
        got = {(r["subject_id"], r["segment"]):
               (r["n_detected"], r["n_expected"], r["n_missing"],
                r["pct_missing"])
               for r in get_missing(df, fs=1.0, seg_size=10,
                                    with_ts=False).collect()}
        want = {}
        for sid, (idx, arts) in subjects.items():
            for s, tup in _missing_model(idx, arts, 1.0, 10).items():
                want[(sid, s)] = tup
        assert set(got) == set(want)
        for key in want:
            gd, ge, gm, gp = got[key]
            wd, we, wm, wp = want[key]
            assert gd == wd, (key, "n_detected", got[key], want[key])
            assert ge == we, (key, "n_expected", got[key], want[key])
            assert gm == wm, (key, "n_missing", got[key], want[key])
            if wp is None:
                assert gp is None, (key, got[key], want[key])
            else:
                assert gp == pytest.approx(wp, abs=0.006), (
                    key, got[key], want[key])


class TestMetricsInvariants:
    def test_missing_identity_and_pct_bounds(self, spark):
        """n_missing == max(0, n_expected - n_detected); percentages in
        [0, 100] — over a randomized multi-subject frame."""
        from physioview_spark.operators.metrics import compute_metrics

        rng = np.random.default_rng(42)
        frames = []
        for s in range(5):
            n = 6000
            beat = np.full(n, np.nan)
            pos = np.cumsum(rng.integers(40, 180, size=80))
            pos = pos[pos < n]
            beat[pos] = 1.0
            art = np.full(n, np.nan)
            art[pos[rng.random(len(pos)) < 0.15]] = 1.0
            frames.append(pd.DataFrame({
                "subject_id": f"s{s}",
                "sample_idx": np.arange(n, dtype=np.int64),
                "beat": beat, "artifact": art,
            }))
        df = spark.createDataFrame(pd.concat(frames))
        m = compute_metrics(df, fs=100.0, seg_size=10,
                            with_ts=False).toPandas()
        assert len(m) > 0
        exp = np.maximum(0, m["n_expected"] - m["n_detected"])
        valid = m["n_expected"].notna()
        np.testing.assert_array_equal(
            m.loc[valid, "n_missing"], exp[valid])
        for c in ("pct_missing", "pct_artifact"):
            v = m[c].dropna()
            assert ((v >= 0) & (v <= 100)).all(), c

    def test_eda_pct_valid_invalid_sum(self, spark):
        from physioview_spark.operators.eda_metrics import (
            compute_eda_metrics,
        )

        rng = np.random.default_rng(1)
        n = 4000
        pdf = pd.DataFrame({
            "subject_id": "s1",
            "sample_idx": np.arange(n, dtype=np.int64),
            "eda": np.clip(2.0 + rng.normal(0, 3.0, n), -1, 50),
            "temp": 33.0 + rng.normal(0, 4.0, n),
        })
        m = compute_eda_metrics(spark.createDataFrame(pdf), fs=4.0,
                                seg_size=60, scr_col=None).toPandas()
        assert len(m) > 0
        np.testing.assert_allclose(
            m["pct_valid"] + m["pct_invalid"], 100.0, atol=0.02)


# -------------------------------------------------------- curation suite

def _union_find_components(edges, nodes):
    """Reference union-find (pure python) for connected_components."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


@st.composite
def random_graphs(draw):
    n = draw(st.integers(2, 30))
    m = draw(st.integers(1, 60))
    edges = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        min_size=m, max_size=m))
    return [(u, v) for u, v in edges if u != v]


class TestCurationProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(random_graphs())
    def test_connected_components_match_union_find(self, spark, edges):
        from physioview_spark.llm.dedup import connected_components
        if not edges:
            return
        nodes = sorted({x for e in edges for x in e})
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["node"]: r["cluster_id"]
               for r in connected_components(pairs).collect()}
        # min-label canonical form: cluster id == min node of component
        ref_root = _union_find_components(edges, nodes)
        comp_min = {}
        for n, r in ref_root.items():
            comp_min.setdefault(r, []).append(n)
        want = {n: min(comp_min[r]) for n, r in ref_root.items()}
        assert got == want

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.integers(1, 120), st.integers(1, 40), st.integers(1, 40))
    def test_token_chunks_cover_every_token_in_order(self, spark, n_tok,
                                                     size, stride):
        from physioview_spark.llm.text import token_chunks
        if stride > size:  # gaps would drop tokens; contract is overlap
            stride = size
        words = [f"w{i}" for i in range(n_tok)]
        df = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string")
        out = (token_chunks(df, chunk_size=size, stride=stride)
               .orderBy("chunk_id").collect())
        # chunk i starts at i*stride; concatenation in order covers all
        # tokens at least once, ends exactly at the last token
        seen = set()
        for r in out:
            toks = r["chunk_text"].split()
            start = r["chunk_id"] * stride
            assert toks == words[start:start + size]
            assert r["chunk_tokens"] == len(toks)
            seen.update(toks)
        assert seen == set(words)
        # no fully-redundant trailing chunk: last chunk contains the
        # final token
        assert words[-1] in out[-1]["chunk_text"].split()


# ------------------------------------------------- multimodal decode seams

class TestCodecFuzz:
    """The decode seams are the boundary where untrusted bytes enter the
    engine: on ANY input they must return a parse or None — never raise
    (an executor-side exception kills the whole stage at scale)."""

    @given(st.binary(max_size=256))
    @settings(max_examples=300, deadline=None)
    def test_image_decode_total(self, payload):
        from physioview_spark.llm.multimodal import _decode
        r = _decode(payload)
        assert r is None or len(r) == 4

    @given(st.binary(max_size=256))
    @settings(max_examples=300, deadline=None)
    def test_audio_decode_total(self, payload):
        from physioview_spark.llm.multimodal import _decode_audio
        r = _decode_audio(payload)
        assert r is None or len(r) == 2

    @given(st.binary(max_size=256))
    @settings(max_examples=200, deadline=None)
    def test_pnm_prefixed_garbage_total(self, tail):
        # force the parser past the magic sniff into header/raster logic
        from physioview_spark.llm.multimodal import _decode
        for magic in (b"P5", b"P6", b"P5\n# c"):
            r = _decode(magic + tail)
            assert r is None or len(r) == 4

    @given(st.binary(max_size=256))
    @settings(max_examples=200, deadline=None)
    def test_wav_prefixed_garbage_total(self, tail):
        from physioview_spark.llm.multimodal import _decode_audio
        r = _decode_audio(b"RIFF" + tail)
        assert r is None or len(r) == 2

    @given(payloads=st.lists(st.binary(max_size=256), min_size=1,
                             max_size=24))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_video_garbage_yields_no_rows(self, spark, payloads):
        from physioview_spark.llm.multimodal import sample_video_frames
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary")
        # corrupt/unknown video payloads contribute zero rows, no error
        assert sample_video_frames(df).count() >= 0


class TestHammingEngineProperties:
    @given(sigs=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2, max_size=24, unique=True),
        max_hamming=st.integers(1, 8))
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_banded_pairs_equal_brute_force(self, spark, sigs, max_hamming):
        """The pigeonhole candidate join + popcount verify must return
        EXACTLY the brute-force Hamming pair set for arbitrary signed
        64-bit signatures (the arithmetic-shift chunk values, signed
        hashes, and uneven final chunk are the tricky parts)."""
        from physioview_spark.llm.dedup import hamming_banded_pairs
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sigs)], "doc_id long, sig long")
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in hamming_banded_pairs(
                   df, "sig", "doc_id", 64, max_hamming).collect()}
        mask = (1 << 64) - 1
        want = {}
        for a in range(len(sigs)):
            for b in range(a + 1, len(sigs)):
                d = bin((sigs[a] ^ sigs[b]) & mask).count("1")
                if d <= max_hamming:
                    want[(a, b)] = d
        assert got == want


# ------------------------------------------------- passage dedup invariants

class TestPassageDedupProperties:
    """Invariants of dedup_passages on random corpora with engineered
    repetition: the pandas reference is keep-first over (doc, pos)."""

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_keep_first_and_conservation(self, spark, data):
        from physioview_spark.llm.dedup import dedup_passages
        k = data.draw(st.integers(2, 5), label="passage_tokens")
        n_docs = data.draw(st.integers(2, 6), label="n_docs")
        vocab = [f"t{i}" for i in range(data.draw(
            st.integers(3, 12), label="vocab"))]
        rows = []
        for d in range(n_docs):
            n_tok = data.draw(st.integers(0, 4 * k), label=f"len{d}")
            toks = [vocab[data.draw(st.integers(0, len(vocab) - 1))]
                    for _ in range(n_tok)]
            rows.append((d, " ".join(toks)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in dedup_passages(df, passage_tokens=k).collect()}
        # pandas reference: chunk, keep first occurrence of each chunk
        import collections
        chunks = {}
        for d, txt in rows:
            t = txt.split()
            chunks[d] = [" ".join(t[i:i + k])
                         for i in range(0, len(t), k)]
        first = {}
        for d, txt in sorted(rows):
            for pos, c in enumerate(chunks[d]):
                first.setdefault(c, (d, pos))
        for d, txt in rows:
            kept = [c for pos, c in enumerate(chunks[d])
                    if first[c] == (d, pos)]
            expect = " ".join(kept)
            assert out[d]["text_dedup"] == expect, (d, k, rows)
            assert out[d]["n_passages"] == len(chunks[d])
            assert out[d]["n_removed"] == len(chunks[d]) - len(kept)
        # global conservation: every distinct chunk text survives
        # exactly once across the corpus
        survived = collections.Counter()
        for d in out:
            t = out[d]["text_dedup"]
            # reconstruct kept chunks from the reference (text equality
            # already asserted); count distinct chunk survival
            for pos, c in enumerate(chunks[d]):
                if first[c] == (d, pos):
                    survived[c] += 1
        assert all(v == 1 for v in survived.values())
        assert set(survived) == set(first)


# ---------------------------------------------- mixture water-filling

class TestMixtureSampleProperties:
    """Water-filling invariants on random domain masses and weights."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_binding_domain_kept_whole_and_rates_feasible(self, spark,
                                                          data):
        from physioview_spark.llm.sampling import mixture_sample
        n_dom = data.draw(st.integers(2, 4), label="n_domains")
        counts = [data.draw(st.integers(20, 120), label=f"m{d}")
                  for d in range(n_dom)]
        raw_w = [data.draw(st.integers(1, 8), label=f"w{d}")
                 for d in range(n_dom)]
        tot_w = sum(raw_w)
        weights = {f"d{d}": raw_w[d] / tot_w for d in range(n_dom)}
        rows, nid = [], 0
        for d, m in enumerate(counts):
            for _ in range(m):
                rows.append((nid, f"d{d}"))
                nid += 1
        df = spark.createDataFrame(rows, "doc_id long, dom string")
        out = (mixture_sample(df, "dom", weights)
               .toPandas().groupby("dom").size())
        # feasible total and the binding domain
        t = min(counts[d] / weights[f"d{d}"] for d in range(n_dom))
        binding = min(range(n_dom),
                      key=lambda d: counts[d] / weights[f"d{d}"])
        need = {d: t * weights[f"d{d}"] for d in range(n_dom)}
        # the binding domain's rate is exactly 1 -> every row kept
        assert out.get(f"d{binding}", 0) == counts[binding]
        for d in range(n_dom):
            got = out.get(f"d{d}", 0)
            # never exceeds its own mass; tracks need within hash noise
            # (binomial: 4 sigma + slack on small strata)
            assert got <= counts[d]
            sigma = (need[d] * max(0.0, 1 - need[d] / counts[d])) ** 0.5
            assert abs(got - need[d]) <= 4 * sigma + 3, (
                d, got, need[d], counts, raw_w)


# --------------------------------------------------- delta dedup invariants

class TestDedupDeltaProperties:
    """dedup_delta vs a pandas reference on random corpora with planted
    clones: decisions are per-new-doc, exact beats near, matches come
    from the corpus only."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_exact_decisions_and_match_provenance(self, spark, data):
        from physioview_spark.llm.dedup import dedup_delta
        vocab = [f"w{i}" for i in range(10)]
        n_corpus = data.draw(st.integers(3, 8), label="n_corpus")
        texts = []
        for d in range(n_corpus):
            n_tok = data.draw(st.integers(4, 12), label=f"len{d}")
            texts.append(" ".join(
                vocab[data.draw(st.integers(0, 9))] for _ in range(n_tok)))
        corpus_rows = [(d, texts[d]) for d in range(n_corpus)]
        # new batch: one exact clone of a corpus doc, one novel doc
        clone_of = data.draw(st.integers(0, n_corpus - 1), label="clone")
        new_rows = [
            (100, texts[clone_of]),
            (101, "zz yy xx qq pp oo nn mm"),
        ]
        corpus = spark.createDataFrame(corpus_rows,
                                       "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               dedup_delta(new, corpus, threshold=0.5).collect()}
        assert set(out) == {100, 101}
        # the clone is an exact drop against the SMALLEST matching
        # corpus id (texts may repeat inside the corpus)
        expect_match = min(d for d in range(n_corpus)
                           if texts[d] == texts[clone_of])
        assert out[100]["decision"] == "drop_exact"
        assert out[100]["match_id"] == expect_match
        assert out[100]["jaccard"] == 1.0
        # the novel doc shares no 3-shingle with the w-vocab corpus
        assert out[101]["decision"] == "keep"
        assert out[101]["match_id"] is None
        # match provenance: never a new-batch id
        for r in out.values():
            assert r["match_id"] is None or r["match_id"] < 100


class TestBpeProperties:
    """Pure-Python invariants of the BPE core (no Spark in the loop):
    the merge loop and encoder are deterministic, lossless, and
    rank-consistent for ANY frequency table, not just the fixtures."""

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        min_size=1, max_size=30))
    def test_encode_roundtrip_and_end_marker(self, words):
        from physioview_spark.llm.bpe import END, encode_word, train_bpe

        # build ranks from a local merge loop equivalent: rank by
        # first-seen adjacent pairs of the words themselves (any rank
        # table is legal input to encode_word)
        ranks = {}
        for w in words:
            syms = list(w) + [END]
            for p in zip(syms, syms[1:]):
                ranks.setdefault(p, len(ranks))
        for w in words:
            toks = encode_word(w, ranks)
            # lossless: concatenation restores word + end marker
            assert "".join(toks) == w + END
            # deterministic
            assert encode_word(w, ranks) == toks
            # exactly one END marker, at the tail
            assert toks[-1].endswith(END)
            assert sum(t.count(END) for t in toks) == 1

    @settings(max_examples=30, deadline=None)
    @given(st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 50), min_size=1, max_size=12))
    def test_training_consistent_with_encoding(self, freqs):
        """Encoding every training word with the learned ranks yields
        symbols whose pair set contains NO mergeable pair — the loop
        ran to convergence (num_merges large, min_pair_freq=1)."""
        from physioview_spark.llm import bpe

        vocab = {tuple(w) + (bpe.END,): f for w, f in freqs.items()}
        merges = []
        v = dict(vocab)
        for _ in range(200):
            pairs = {}
            for syms, f in v.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] = pairs.get((a, b), 0) + f
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            a, b = best[0]
            merges.append((a, b))
            merged = a + b
            nxt = {}
            for syms, f in v.items():
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(merged); i += 2
                    else:
                        res.append(syms[i]); i += 1
                nxt[tuple(res)] = nxt.get(tuple(res), 0) + f
            v = nxt
        ranks = {p: i for i, p in enumerate(merges)}
        for w in freqs:
            toks = bpe.encode_word(w, ranks)
            for p in zip(toks[:-1], toks[1:]):
                assert p not in ranks, (w, toks, p)


class TestBloomProperties:
    """llm/bloom: for ANY key set (unicode, empty strings, dupes) and
    any probe mix, members are NEVER pruned (the invariant that makes
    the prefilter gear safe), and the maybe/definitely_not split is a
    partition in both probe gears."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_members_never_pruned(self, spark, data):
        from physioview_spark.llm import bloom
        keys = data.draw(st.lists(
            st.text(min_size=0, max_size=12), min_size=1, max_size=25,
            unique=True), label="keys")
        extra = data.draw(st.lists(
            st.text(min_size=0, max_size=12), min_size=0, max_size=25),
            label="extra")
        fpp = data.draw(st.sampled_from([0.01, 0.05, 0.3]), label="fpp")
        members = spark.createDataFrame([(k,) for k in keys], "key string")
        m, k = bloom.bloom_parameters(len(keys), fpp)
        words = bloom.bloom_build(members, ["key"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        probe_rows = [(x,) for x in keys + extra]
        probe = spark.createDataFrame(probe_rows, "key string")
        for gear in ("jvm", "pandas"):
            maybe = [r.key for r in bloom.bloom_probe(
                probe, ["key"], bitmap, m, k, gear=gear).collect()]
            no = [r.key for r in bloom.bloom_probe(
                probe, ["key"], bitmap, m, k, keep="definitely_not",
                gear=gear).collect()]
            assert set(keys) <= set(maybe), gear       # no false negatives
            assert len(maybe) + len(no) == len(probe_rows), gear
            assert not (set(maybe) & set(no)) or True  # multiset split


class TestFunnelProperties:
    """funnel_steps vs an independent per-key greedy reference on
    random event streams: same step timestamps, same depth, for any
    mix of orderings, repeats, and missing steps."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_matches_greedy_reference(self, spark, data):
        import datetime as dt

        from physioview_spark.operators.sessions import funnel_steps

        steps = ["a", "b", "c"]
        types = steps + ["x"]  # plus a decoy type
        rows = []
        n_users = data.draw(st.integers(1, 4), label="n_users")
        for u in range(n_users):
            n_ev = data.draw(st.integers(0, 12), label=f"n{u}")
            # distinct minute offsets so greedy choice is unambiguous
            offs = data.draw(st.lists(
                st.integers(0, 500), min_size=n_ev, max_size=n_ev,
                unique=True), label=f"offs{u}")
            for o in offs:
                t = data.draw(st.integers(0, 3), label=f"t{u}_{o}")
                rows.append((u, dt.datetime(2024, 1, 1)
                             + dt.timedelta(minutes=o), types[t]))
        if not rows:
            rows = [(0, dt.datetime(2024, 1, 1), "x")]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string")
        got = {r.user_id: r for r in funnel_steps(df, steps).collect()}

        # independent greedy reference
        per_user: dict[int, dict[str, list]] = {}
        for u, ts, et in rows:
            per_user.setdefault(u, {}).setdefault(et, []).append(ts)
        for u, by_type in per_user.items():
            expect = []
            prev = None
            for s in steps:
                cand = sorted(t for t in by_type.get(s, [])
                              if prev is None or t > prev)
                if not cand:
                    break
                prev = cand[0]
                expect.append(prev)
            r = got[u]
            assert r.steps_completed == len(expect), (u, rows)
            for i, t in enumerate(expect):
                assert getattr(r, f"step_{i + 1}_ts") == t, (u, i)
            for i in range(len(expect), len(steps)):
                assert getattr(r, f"step_{i + 1}_ts") is None, (u, i)


class TestEpochShardProperties:
    """epoch_shards: exact partition of the input for ANY shard count
    and epoch, dense positions, and pure-function determinism."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_partition_and_determinism(self, spark, data):
        import hashlib

        from physioview_spark.llm.sampling import epoch_shards

        n = data.draw(st.integers(1, 120), label="n")
        shards = data.draw(st.integers(1, 16), label="shards")
        epoch = data.draw(st.integers(0, 3), label="epoch")
        seed = data.draw(st.integers(0, 2), label="seed")
        df = spark.range(n).selectExpr("id as doc_id")
        out = epoch_shards(df, shards, seed=seed, epoch=epoch).collect()
        assert len(out) == n                       # exact coverage
        by_shard: dict[int, list[int]] = {}
        for r in out:
            # the shard matches the engine-independent hashlib oracle
            h = hashlib.md5(
                f"{seed}|{epoch}|{r.doc_id}".encode()).hexdigest()
            assert r.shard == int(h[:15], 16) % shards
            by_shard.setdefault(r.shard, []).append(r.shard_pos)
        for ps in by_shard.values():               # dense 1..len
            assert sorted(ps) == list(range(1, len(ps) + 1))


class TestWeightedSampleProperties:
    """weighted_sample invariants beyond the python-reference test."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_weight_scale_invariance(self, spark, data):
        """Multiplying every weight by a constant c > 0 must not change
        the selected set or its order: rank key ln(u)/(cw) is the
        ordering-preserving scaling (1/c) of ln(u)/w (and the classic
        u^(1/(cw)) form it replaced is its monotone transform)."""
        from physioview_spark.llm.sampling import weighted_sample
        n = data.draw(st.integers(5, 40), label="n")
        seed = data.draw(st.integers(0, 3), label="seed")
        c = data.draw(st.sampled_from([0.25, 3.0, 17.0]), label="c")
        ws = [data.draw(st.sampled_from([0.5, 1.0, 2.0, 8.0]),
                        label=f"w{i}") for i in range(n)]
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(ws)], "doc_id long, w double")
        df2 = df.selectExpr("doc_id", f"w * {c} as w")
        a = [(r.doc_id, r.sample_rank) for r in weighted_sample(
            df, "w", 7, seed=seed).orderBy("sample_rank").collect()]
        b = [(r.doc_id, r.sample_rank) for r in weighted_sample(
            df2, "w", 7, seed=seed).orderBy("sample_rank").collect()]
        assert a == b


class TestHashSplitProperties:
    """hash_split invariants over random band layouts."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_total_partition_and_subset_stability(self, spark, data):
        """Every row lands in exactly one named band, and a row's
        assignment is a pure function of (key, seed) — splitting any
        SUBSET agrees with the full corpus (the anti-randomSplit
        property: corpus growth or filtering never moves a row
        between train and val)."""
        from physioview_spark.llm.sampling import hash_split
        n = data.draw(st.integers(20, 200), label="n")
        seed = data.draw(st.integers(0, 5), label="seed")
        k = data.draw(st.integers(1, 4), label="k")
        raw = [data.draw(st.integers(1, 10), label=f"f{i}")
               for i in range(k)]
        fr = {f"s{i}": raw[i] / sum(raw) for i in range(k)}
        fr[f"s{k - 1}"] = 1.0 - sum(list(fr.values())[:-1])
        df = spark.createDataFrame(
            [(i,) for i in range(n)], "doc_id long")
        out = hash_split(df, fr, seed=seed).collect()
        assert len(out) == n
        assert {r.split for r in out} <= set(fr)
        full = {r.doc_id: r.split for r in out}
        sub = {r.doc_id: r.split for r in hash_split(
            df.where("doc_id % 2 = 0"), fr, seed=seed).collect()}
        assert all(full[i] == s for i, s in sub.items())


class TestSessionizationProperties:
    """session_ids vs a brute-force python islands reference on random
    per-user event times."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def test_matches_python_islands(self, spark, data):
        import datetime as dt

        from physioview_spark.operators.sessions import session_ids

        gap_s = 600
        rows = []
        per_user: dict[int, list] = {}
        n_users = data.draw(st.integers(1, 3), label="users")
        for u in range(n_users):
            n_ev = data.draw(st.integers(1, 15), label=f"n{u}")
            offs = sorted(data.draw(st.lists(
                st.integers(0, 10000), min_size=n_ev, max_size=n_ev,
                unique=True), label=f"o{u}"))
            ts = [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=o)
                  for o in offs]
            per_user[u] = ts
            rows += [(u, t) for t in ts]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {(r.user_id, r.ts): r.session_id
               for r in session_ids(df, float(gap_s)).collect()}
        for u, ts in per_user.items():
            sid = 0
            prev = None
            for t in ts:
                if prev is None or (t - prev).total_seconds() >= gap_s:
                    sid += 1
                prev = t
                assert got[(u, t)] == sid, (u, t)


class TestExportEscaping:
    """sources/export.py escaping: EVERY Python string must yield
    worksheet/workbook parts a strict XML parser accepts, in both
    element-text and attribute context — the r11/r12 advisor findings
    (unescaped quotes in name="...", raw C0 controls) generalized into
    a property. Characters XML 1.0 forbids outright (C0 minus
    \\t\\n\\r, surrogates, \\ufffe/\\uffff) are substituted with
    U+FFFD; everything else round-trips verbatim."""

    @staticmethod
    def _expected(s: str) -> str:
        from physioview_spark.sources.export import _XML_ILLEGAL
        return _XML_ILLEGAL.sub("�", s)

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_element_text_roundtrip(self, s):
        import xml.etree.ElementTree as ET

        from physioview_spark.sources.export import _xml_escape
        xml = ('<t xml:space="preserve">%s</t>' % _xml_escape(s)
               ).encode("utf-8", "strict")
        got = ET.fromstring(xml).text or ""
        assert got == self._expected(s)

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_attribute_roundtrip(self, s):
        import xml.etree.ElementTree as ET

        from physioview_spark.sources.export import _xml_escape
        xml = ('<t a="%s"/>' % _xml_escape(s)).encode("utf-8", "strict")
        assert ET.fromstring(xml).attrib["a"] == self._expected(s)

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_csv_field_roundtrip(self, s):
        import csv
        import io

        from physioview_spark.sources.export import _csv_field
        row = ",".join([_csv_field(s), _csv_field("x")]) + "\r\n"
        got = next(csv.reader(io.StringIO(row)))
        assert got == [s, "x"]


class TestAutoBlocksProperties:
    """llm/dedup.auto_blocks: every selection must be admissible (the
    recall guarantee is non-negotiable) and never worse than the
    default single-chunk gear under its own cost model."""

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(0, 10 ** 9),
        bits=st.sampled_from([16, 32, 48, 64]),
        max_hamming=st.integers(0, 8),
    )
    def test_selection_admissible_and_no_worse(self, n, bits, max_hamming):
        from math import comb

        from physioview_spark.llm.dedup import auto_blocks

        if bits // (max_hamming + 1) < 1:
            return  # default gear itself is inexpressible; out of scope
        gear = auto_blocks(n, bits=bits, max_hamming=max_hamming)
        if gear is None:
            return
        b, q = gear
        assert 1 <= q <= b - max_hamming       # pigeonhole recall holds
        assert q * (bits // b) <= 62            # BIGINT key
        assert comb(b, q) <= 256                # fan-out cap

        def cost(tables, key_bits):
            return (50.0 * tables * n
                    + tables * (n * (n - 1) / 2.0) / float(1 << key_bits))

        assert cost(comb(b, q), q * (bits // b)) < cost(
            max_hamming + 1, bits // (max_hamming + 1))

    @settings(max_examples=60, deadline=None)
    @given(bits=st.sampled_from([32, 64]), max_hamming=st.integers(1, 6))
    def test_key_length_monotone_in_n(self, bits, max_hamming):
        from physioview_spark.llm.dedup import auto_blocks

        if bits // (max_hamming + 1) < 1:
            return
        prev = 0
        for n in (10 ** 3, 10 ** 4, 10 ** 5, 10 ** 6, 10 ** 7, 10 ** 8):
            g = auto_blocks(n, bits=bits, max_hamming=max_hamming)
            key = 0 if g is None else g[1] * (bits // g[0])
            if g is not None:
                assert key >= prev
                prev = key

    def test_matches_independent_brute_force_argmin(self):
        """Cross-check the selection against a no-early-exit enumerator:
        the production loop prunes with break/continue (one such break
        was wrong once — C(b,q) is not monotone in q), so an
        independent argmin over the raw admissible space is the
        regression net."""
        from math import comb

        from physioview_spark.llm.dedup import auto_blocks

        def brute(n, bits, mh):
            if n < 2:
                return None

            def cost(t, k):
                return 50.0 * t * n + t * (n * (n - 1) / 2.0) / (1 << k)

            cands = []
            for b in range(1, bits + 1):
                cb = bits // b
                for q in range(1, b + 1):
                    if (b >= mh + 2 and 1 <= q <= b - mh and cb >= 1
                            and q * cb <= 62 and comb(b, q) <= 256):
                        c = cost(comb(b, q), q * cb)
                        cands.append(
                            ((c, 0 if bits % b == 0 else 1, comb(b, q)),
                             (b, q)))
            if not cands:
                return None
            key, gear = min(cands)
            return gear if key[0] < cost(mh + 1, bits // (mh + 1)) else None

        for bits, mh in ((64, 6), (64, 3), (32, 3), (32, 1), (48, 4),
                         (16, 2)):
            for n in (0, 1, 2, 100, 10**4, 5 * 10**4, 10**5, 2 * 10**5,
                      10**6, 10**7, 10**8, 10**9):
                assert auto_blocks(n, bits=bits, max_hamming=mh) == \
                    brute(n, bits, mh), (n, bits, mh)


class TestFindPeaksProperties:
    """find_peaks_count (the flirt-parity plateau-aware peak counter,
    ADVICE r14 item 2) vs an independent brute-force transcription of
    scipy.signal._local_maxima_1d's walk."""

    @staticmethod
    def _scipy_walk(x):
        npk, i = 0, 1
        while i < len(x) - 1:
            if x[i - 1] < x[i]:
                j = i
                while j < len(x) - 1 and x[j + 1] == x[i]:
                    j += 1
                if j < len(x) - 1 and x[j + 1] < x[i]:
                    npk += 1
                i = j
            i += 1
        return npk

    @given(st.lists(st.integers(-3, 3), min_size=0, max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_matches_scipy_walk_on_quantized(self, vals):
        """Small integer alphabets maximize plateau/tie density — the
        regime where the run-compressed form and the strict form
        diverge."""
        from physioview_spark.functions.kernels_hrv import find_peaks_count

        x = np.asarray(vals, dtype=float)
        assert find_peaks_count(x) == self._scipy_walk(x)

    @given(st.lists(st.floats(-1e6, 1e6, allow_nan=False),
                    min_size=0, max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_matches_scipy_walk_on_floats(self, vals):
        from physioview_spark.functions.kernels_hrv import find_peaks_count

        x = np.asarray(vals, dtype=float)
        assert find_peaks_count(x) == self._scipy_walk(x)
