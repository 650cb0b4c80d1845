"""(Re)generate the hostile-axis corpora (VERDICT r17 item 5).

The r17 round proved each axis finds real defects (8 empty, 1 skew, 24
null-heavy findings); this tool makes their generation deterministic
and standing instead of a one-off session artifact. Axes:

- ``empty``  — structurally-identical ZERO-ROW tables (an empty
  partition/slice of a new corpus is routine at 100 TB). Written with
  SPARK ``limit(0)`` so the exact driver-visible schemas survive —
  including events' TIMESTAMP(NANOS) physical type, which a DuckDB
  rewrite would coerce.
- ``skew``   — hot keys and duplicate families: 50% of events on one
  hot user, 50% of orders on the min custkey, 10% byte-identical
  document texts, 10% identical embeddings (hot minhash/IVF buckets,
  one giant window partition).
- ``nulls``  — the NULL/empty-value axis: 20% NULL event values, 5%
  NULL event_type, 10% NULL + 10% empty-string document text, 10%
  NULL lang, 10% NULL embedding arrays.
- ``extremes`` — the numeric-extremes axis (r18): NaN / +-Inf /
  +-1e4 / IEEE -0.0 / NULL event values at coprime id-modulo rates
  (~5% each, so most windows stay finite but some get each poison),
  plus NaN/+-Inf embedding COMPONENTS and 1e4-scaled vectors — one
  poisoned vector sits at a SEED id (vec_id 4, even < 16) so the
  codebook path itself must apply the finiteness filter (the
  excluded-vector contract, similarity.vector_is_finite: search/
  quantization excludes NULL-or-non-finite vectors on both sides,
  dedup keeps them as trivially-unique NULL-bucket rows).
  Sensor glitches and saturated readings are routine at 100 TB; the
  contract split is: SIGNAL tier (dsp kernels via apply_kernel) treats
  non-finite samples as MISSING (dsp/apply.py moving_average — the
  prefix-sum and FFT kernels cannot express finite-window IEEE
  semantics), RELATIONAL tier (SQL aggregates) propagates per IEEE,
  with oracle guards where DuckDB's aggregate THROWS instead of
  propagating (STDDEV/VAR/SKEW/KURT/CORR raise Out of Range on
  non-finite input where Spark yields NaN). Outlier magnitude is
  capped at 1e4 — the 6-decimal-rounding comparability envelope, set
  by the HIGHEST-ORDER form among declared queries: a 1e12 probe made
  the kernel's prefix-sum and DuckDB's window AVG differ by
  float-summation ORDER alone (~1e-4 absolute at 1e11 magnitudes,
  where ROUND(x, 6) is an identity), and a 1e6 probe still left
  ~5e-6 evaluation-order noise in svd_entropy's lag-embedding
  Gram/acos closed form (quadratic terms span 1e12, cancelling ~8
  significant digits). No cross-engine contract can close
  float-ordering noise; at 1e4 it sits below the rounding grid for
  every declared form and real semantic divergences stay visible.
- ``unicode`` — the multibyte/hostile-whitespace text axis (r18):
  10% CJK+emoji prefixes (supplementary-plane code points through
  split/substring/length/md5), 10% combining-diacritic + NBSP/ZWJ
  suffixes (Unicode spaces are NOT token whitespace by contract
  tier 0), 10% tab-padded texts with ALL spaces swapped for vertical
  tabs (\\x0B — the Java-\\s-vs-RE2-\\s divergence the explicit
  TOKEN_WS class exists for; token counts must equal the base
  corpus's), 10% CRLF second lines, 10% whitespace-only (tokenless
  non-empty) texts in TWO byte-distinct variants — byte-level exact
  dedup must NOT group them while token-level shingles (tier 4's ''
  whole-text gram) MUST, so a pipeline that conflates the two tiers
  diverges here. Deliberately EXCLUDED: U+0130 and final-form
  sigma — contextual case mappings are platform-divergent by
  construction (llm/text.py contract tier 6) and pinned engine-side
  in tests/test_unicode_axis.py instead.

All selections are id-modulo conditions — a pure function of the base
corpus, no RNG — so a regenerated axis is bit-identical for a given
base. Usage::

    python tools/make_axis_corpora.py [base_sf_dir] [out_root]

Defaults: base /root/testdata/sf0.01 (empty uses sf0.001 — row count
is irrelevant at zero rows and the schema is identical), out_root
/tmp (corpora land at <out_root>/pv_{empty,skew,nulls,unicode,extremes}).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: axis -> {table: REPLACE clause}; untouched tables are byte-copied.
_DUCK_TRANSFORMS = {
    "skew": {
        "events": """REPLACE (
            CASE WHEN user_id % 10 < 5 THEN 7 ELSE user_id END
              AS user_id)""",
        "orders": """REPLACE (
            CASE WHEN o_custkey % 10 < 5 THEN {hot} ELSE o_custkey END
              AS o_custkey)""",
        "documents": """REPLACE (
            CASE WHEN doc_id % 10 = 3
                 THEN 'the hot duplicated document text that lands """
        """every copy in the same buckets' ELSE text END AS text)""",
        "embeddings": """REPLACE (
            CASE WHEN vec_id % 10 = 3
                 THEN (SELECT embedding
                       FROM read_parquet('{src}/embeddings.parquet')
                       ORDER BY vec_id LIMIT 1)
                 ELSE embedding END AS embedding)""",
    },
    "extremes": {
        "events": """REPLACE (
            CASE WHEN event_id % 19 = 4  THEN 'nan'::DOUBLE
                 WHEN event_id % 23 = 7  THEN 'infinity'::DOUBLE
                 WHEN event_id % 29 = 11 THEN '-infinity'::DOUBLE
                 WHEN event_id % 31 = 13 THEN 1e4
                 WHEN event_id % 37 = 17 THEN -1e4
                 WHEN event_id % 41 = 23 THEN -0.0
                 WHEN event_id % 43 = 29 THEN NULL
                 ELSE value END AS value)""",
        "embeddings": """REPLACE (
            (CASE WHEN vec_id = 4
                     THEN ['infinity'::FLOAT] || embedding[2:]
                 WHEN vec_id % 13 = 3
                     THEN ['nan'::FLOAT] || embedding[2:]
                 WHEN vec_id % 17 = 5
                     THEN ['-infinity'::FLOAT] || embedding[2:]
                 WHEN vec_id % 23 = 7
                     THEN list_transform(embedding, x -> x * 1e4)
                 ELSE embedding END)::FLOAT[] AS embedding)""",
    },
    "unicode": {
        "documents": """REPLACE (
            CASE
                WHEN doc_id % 10 = 1
                    THEN '漢字の文書😀テスト ' || text
                WHEN doc_id % 10 = 2
                    THEN text || ' cafe' || chr(769) || ' x' ||
                         chr(160) || 'y a' || chr(8205) || 'b'
                WHEN doc_id % 10 = 5
                    THEN chr(9) || replace(text, ' ', chr(11)) || chr(9)
                WHEN doc_id % 10 = 8
                    THEN text || chr(13) || chr(10) ||
                         'zweite Zeile mit Text'
                WHEN doc_id % 20 = 9
                    THEN chr(9) || chr(11) || ' ' || chr(12) || chr(13)
                WHEN doc_id % 20 = 19
                    THEN ' ' || chr(9) || chr(9)
                ELSE text
            END AS text)""",
    },
    "nulls": {
        "events": """REPLACE (
            CASE WHEN event_id % 5 = 2 THEN NULL ELSE value END
              AS value,
            CASE WHEN event_id % 20 = 7 THEN NULL ELSE event_type END
              AS event_type)""",
        "documents": """REPLACE (
            CASE WHEN doc_id % 10 = 3 THEN NULL
                 WHEN doc_id % 10 = 6 THEN '' ELSE text END AS text,
            CASE WHEN doc_id % 10 = 4 THEN NULL ELSE lang END
              AS lang)""",
        "embeddings": """REPLACE (
            CASE WHEN vec_id % 10 = 3 THEN NULL ELSE embedding END
              AS embedding)""",
    },
}


def make_empty(out: str, schema_src: str) -> None:
    """Zero-row tables with the exact driver-visible schemas (Spark
    write preserves parquet physical types a DuckDB rewrite would
    not)."""
    import glob

    from physioview_spark.session import get_spark

    spark = get_spark("mk-axis-empty")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        df = spark.read.parquet(f"{schema_src}/{t}.parquet").limit(0)
        tmp = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        # flatten the Spark directory layout to one file per table:
        # the oracle side reads read_parquet('<dir>/<t>.parquet') as a
        # single file, not a part-file directory
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)


def make_transformed(axis: str, out: str, src: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=16")
    hot = con.execute(
        f"SELECT min(o_custkey) "
        f"FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    transforms = _DUCK_TRANSFORMS[axis]
    for t in TABLES:
        repl = transforms.get(t, "")
        repl = repl.format(src=src, hot=hot) if repl else ""
        con.execute(
            f"COPY (SELECT * {repl} "
            f"FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    con.close()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    empty_schema_src = os.path.join(os.path.dirname(src.rstrip("/")),
                                    "sf0.001")
    if not os.path.isdir(empty_schema_src):
        empty_schema_src = src
    make_empty(os.path.join(root, "pv_empty"), empty_schema_src)
    print(f"wrote {root}/pv_empty (schemas from {empty_schema_src})")
    for axis in ("skew", "nulls", "unicode", "extremes"):
        out = os.path.join(root, f"pv_{axis}")
        make_transformed(axis, out, src)
        print(f"wrote {out} (from {src})")


if __name__ == "__main__":
    main()
