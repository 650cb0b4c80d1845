"""Regenerate the raw plan dumps embedded in PLANS.md.

Usage: python tools/dump_plans.py [sf_dir] [query ...]
Prints `@@@<name>` sections with `explain("formatted")` output.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

DEFAULT = [
    "pricing_summary", "top_revenue_nations", "asof_latest_order",
    "rolling_event_counts", "dedup_keep_first", "embedding_cosine_topk",
    "order_value_interp", "doc_stratified_sample", "asof_tolerance_match",
    "doc_pack_sequences", "doc_curation_pipeline_v3",
    "doc_hash_split", "doc_temperature_mixture",
]


def main() -> None:
    from physioview_spark.session import get_spark
    import __spark_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"@@@{name}")
        print(buf.getvalue())


if __name__ == "__main__":
    main()
