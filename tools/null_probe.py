"""NULL-degenerate probe (the verify-skill discipline, mechanized).

Builds a fixture directory that symlinks every sf0.01 table except the
one under test, rewrites that table with deterministic NULL injections,
and runs ``tools/check_oracle.py``'s comparison over the affected
queries.  The divergence class this catches is real and recurring:
Spark legacy ``sizeOfNull`` (-1 vs NULL), Spark NULLS FIRST vs DuckDB
NULLS LAST in window walks, and NULL join keys silently dropping rows
from one engine's plan but not the other's GROUP BY.

Usage:
    python tools/null_probe.py events   [query ...]
    python tools/null_probe.py documents [query ...]

Default query lists cover every registered consumer of the table.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

INJECTIONS = {
    "events": """
        SELECT event_id,
          CASE WHEN event_id % 53 = 0 THEN NULL ELSE ts END AS ts,
          CASE WHEN event_id % 19 = 0 THEN NULL ELSE user_id END AS user_id,
          CASE WHEN event_id % 31 = 0 THEN NULL ELSE event_type END AS event_type,
          CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS value,
          CASE WHEN event_id % 29 = 0 THEN NULL ELSE props END AS props
        FROM read_parquet('{src}')
    """,
    "documents": """
        SELECT doc_id,
          CASE WHEN doc_id % 17 = 0 THEN NULL ELSE text END AS text,
          CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
          CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS source,
          CASE WHEN doc_id % 17 = 0 THEN NULL ELSE n_chars END AS n_chars
        FROM read_parquet('{src}')
    """,
}

DEFAULT_QUERIES = {
    "events": [
        "events_hourly", "user_sessions", "events_active_users",
        "events_value_binning", "events_value_quantiles", "events_funnel",
        "events_cohort_retention", "events_twap", "events_gapfill_locf",
        "events_ohlc", "events_attribution", "events_transition_matrix",
        "events_anomaly_mad", "events_hll_mergeable_rollup",
        "events_multigrain_rollup", "events_json_kv",
        "events_salted_user_stats", "scd2_user_state",
        "events_asof_last_purchase", "events_lookback_count",
        "events_heavy_hitters", "events_sketch_profile",
        "events_stream_hourly", "events_stream_sliding",
        "events_stream_sessions", "events_stream_dedup",
        "events_stream_enriched", "events_stream_order_shipment",
        "events_stream_upsert", "snapshot_cdc_diff",
    ],
    "documents": [
        "dedup_exact", "dedup_survivors", "dedup_minhash_lsh",
        "dedup_clusters", "dedup_near_survivors", "dedup_simhash",
        "dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_prefix_filter",
        "corpus_quality_filter", "doc_repetition", "corpus_length_histogram",
        "tfidf_top_terms", "text_stats", "lang_id", "doc_fingerprints",
        "doc_chunking", "pii_scrub_stats", "contamination_check",
        "corpus_mixture_sample", "sequence_packing", "doc_winnowing",
        "corpus_stratified_sample", "corpus_shard_manifest",
    ],
}


def main() -> None:
    table = sys.argv[1] if len(sys.argv) > 1 else "events"
    queries = sys.argv[2:] or DEFAULT_QUERIES[table]
    d = tempfile.mkdtemp(prefix=f"lsdp_nullprobe_{table}_")
    for t in TABLES:
        if t != table:
            os.symlink(f"{SF}/{t}.parquet", os.path.join(d, f"{t}.parquet"))
    con = duckdb.connect()
    sql = INJECTIONS[table].format(src=f"{SF}/{table}.parquet")
    con.execute(f"COPY ({sql}) TO '{d}/{table}.parquet' (FORMAT PARQUET)")
    print(f"[null_probe] fixture at {d}; probing {len(queries)} queries")
    rc = subprocess.call(
        [sys.executable, os.path.join(HERE, "check_oracle.py"), d, *queries]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
