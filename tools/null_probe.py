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
    # keys stay NOT NULL (referential integrity is a generator invariant);
    # dates, measures, and flags are the plausibly-nullable columns
    "orders": """
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 31 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
          CASE WHEN o_orderkey % 23 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice,
          CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
          CASE WHEN o_orderkey % 29 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM read_parquet('{src}')
    """,
    # dim-source attribute axes (VERDICT r4 next-round #6): the J6/J7
    # normalized joins and the dim_* builders run upper(trim(...)) /
    # dedup / surrogate-keygen over these attribute columns — NULLs here
    # exercise exactly the paths the four original axes skipped
    "part": """
        SELECT p_partkey,
          CASE WHEN p_partkey % 13 = 0 THEN NULL ELSE p_name END AS p_name,
          CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE p_brand END AS p_brand,
          CASE WHEN p_partkey % 17 = 0 THEN NULL ELSE p_type END AS p_type,
          CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE p_size END AS p_size,
          CASE WHEN p_partkey % 23 = 0 THEN NULL ELSE p_retailprice END AS p_retailprice
        FROM read_parquet('{src}')
    """,
    "supplier": """
        SELECT s_suppkey,
          CASE WHEN s_suppkey % 13 = 0 THEN NULL ELSE s_name END AS s_name,
          CASE WHEN s_suppkey % 11 = 0 THEN NULL ELSE s_nationkey END AS s_nationkey,
          CASE WHEN s_suppkey % 17 = 0 THEN NULL ELSE s_acctbal END AS s_acctbal
        FROM read_parquet('{src}')
    """,
    "customer": """
        SELECT c_custkey,
          CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END AS c_name,
          CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_nationkey END AS c_nationkey,
          CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
          CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        FROM read_parquet('{src}')
    """,
    # tiny lookup dims: keys stay NOT NULL, names/comments are the
    # nullable attribute axes (upper(trim(NULL)) flows through every
    # dim build and geo join)
    "nation": """
        SELECT n_nationkey,
          CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_name END AS n_name,
          CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_regionkey END AS n_regionkey
        FROM read_parquet('{src}')
    """,
    "region": """
        SELECT r_regionkey,
          CASE WHEN r_regionkey % 2 = 0 THEN NULL ELSE r_name END AS r_name
        FROM read_parquet('{src}')
    """,
    # a vector-less row (ingest gap) and an unlabeled row are the
    # plausible NULL shapes; vec_id stays NOT NULL (generator invariant)
    "embeddings": """
        SELECT vec_id,
          CASE WHEN vec_id % 13 = 0 THEN NULL ELSE embedding END AS embedding,
          CASE WHEN vec_id % 11 = 0 THEN NULL ELSE label END AS label
        FROM read_parquet('{src}')
    """,
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
          CASE WHEN (l_orderkey + l_linenumber) % 23 = 0 THEN NULL ELSE l_quantity END AS l_quantity,
          CASE WHEN (l_orderkey + l_linenumber) % 29 = 0 THEN NULL ELSE l_extendedprice END AS l_extendedprice,
          CASE WHEN (l_orderkey + l_linenumber) % 31 = 0 THEN NULL ELSE l_discount END AS l_discount,
          CASE WHEN (l_orderkey + l_linenumber) % 37 = 0 THEN NULL ELSE l_tax END AS l_tax,
          CASE WHEN (l_orderkey + l_linenumber) % 41 = 0 THEN NULL ELSE l_returnflag END AS l_returnflag,
          CASE WHEN (l_orderkey + l_linenumber) % 43 = 0 THEN NULL ELSE l_linestatus END AS l_linestatus,
          CASE WHEN (l_orderkey + l_linenumber) % 53 = 0 THEN NULL ELSE l_shipdate END AS l_shipdate
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
        "events_stream_sessions", "events_stream_sessions_flushed",
        "events_stream_dedup",
        "events_stream_enriched", "events_stream_order_shipment",
        "events_stream_upsert", "snapshot_cdc_diff", "events_orc_readback",
        "events_stream_jdbc_hourly", "events_conversion_lag",
        "events_stickiness_hll",
        "events_attribution_decayed", "scd2_daily_snapshot",
        "events_upsert_changes", "events_upsert_timetravel",
        "events_upsert_delete",
        # r10 registration (ts/user_id gated both sides)
        "events_feature_matrix",
    ],
    "orders": [
        "a6_sales_trend", "a6_sales_trend_mom", "cumulative_monthly_sales",
        "daily_sales_moving_avg", "orders_backlog_series",
        "customer_rfm_scores", "repeat_customers_yoy", "top_customers",
        "snapshot_cdc_diff", "orders_zorder_clustering", "scd2_user_state",
        "sql_shipping_priority", "sql_customer_order_distribution",
        "sql_orders_above_customer_avg", "sql_large_volume_orders",
        "sql_lapsed_big_spenders", "sql_unshipped_orders",
        "sql_prospect_customers", "supplier_pagerank", "graph_hop_distance",
        "dim_junk_status", "fact_lineitem", "customer_rfm_scores_approx",
        "fact_backfill_plan", "sales_trendline_ols", "sales_forecast_ses",
    ],
    "lineitem": [
        "q1_pricing_summary", "a5_profit_rollup", "a5_profit_by_hierarchy",
        "a5_profit_cube", "a7_schedule_adherence", "a8_returns_by_nation",
        "lineitem_abc_pareto", "basket_part_pairs", "orders_backlog_series",
        "lineitem_measures_unpivot", "fact_lineitem", "fact_write_readback",
        "sql_promo_revenue", "sql_forecast_revenue", "sql_disjunctive_basket",
        "sql_returned_item_losses", "sql_priority_shipping_split",
        "sql_volume_shipping", "sql_market_share", "sql_top_supplier",
        "brand_share_within_type", "dim_junk_status",
        "lineitem_abc_pareto_approx", "lineitem_column_profile",
    ],
    "part": [
        "dim_brand", "dim_product_type", "dim_product", "fact_lineitem",
        "fact_write_readback", "a5_profit_rollup", "a5_profit_by_hierarchy",
        "a5_profit_cube", "brand_share_within_type", "basket_part_pairs",
        "sql_promo_revenue", "sql_important_parts", "sql_cheapest_supplier",
        "sql_supplier_part_variety", "sql_small_quantity_revenue",
        "sql_forecast_revenue",
        "sql_product_profit_by_nation_year",
        # sql_profit_by_hierarchy deregistered r12: its NULL coverage
        # rides a5_profit_by_hierarchy (above) + the bit-exact twin pin
    ],
    "supplier": [
        "fact_lineitem", "a8_returns_by_nation", "sql_top_supplier",
        "sql_cheapest_supplier", "sql_excess_suppliers",
        "sql_waiting_suppliers", "sql_local_supplier_volume",
        "sql_volume_shipping", "sql_market_share",
        "sql_product_profit_by_nation_year", "supplier_pagerank",
    ],
    "customer": [
        "dim_customer", "dim_geography", "fact_lineitem", "top_customers",
        "sales_forecast_ses", "sales_trendline_ols",
        "customer_rank_in_nation", "acctbal_band_join",
        "acctbal_window_profile", "segment_region_pivot",
        "repeat_customers_yoy", "sql_shipping_priority",
        "sql_local_supplier_volume", "sql_market_share",
        "sql_lapsed_big_spenders", "sql_prospect_customers",
        "sql_customer_order_distribution", "sql_orders_above_customer_avg",
        "sql_volume_shipping",
    ],
    "nation": [
        "a8_returns_by_nation", "customer_rank_in_nation", "dim_customer",
        "dim_geography", "segment_region_pivot", "sql_local_supplier_volume",
        "sql_market_share", "sql_product_profit_by_nation_year",
        "sql_returned_item_losses", "sql_volume_shipping",
        "sql_waiting_suppliers", "warehouse_integrity_audit",
        "warehouse_orc_readback",
    ],
    "region": [
        "dim_customer", "dim_geography", "dim_region", "segment_region_pivot",
        "sql_local_supplier_volume", "sql_market_share",
        "warehouse_integrity_audit", "warehouse_orc_readback",
    ],
    "embeddings": [
        "dedup_embedding", "embedding_centered", "embedding_outliers",
        "embedding_quantize", "embedding_stats", "similarity_topk",
        "similarity_ann_lsh", "similarity_ann_multiprobe",
        "similarity_ivf", "similarity_ivf_kmeans", "similarity_pq_adc",
        "similarity_pq_refine", "dedup_semantic",
        "similarity_ivf_incremental", "similarity_ivf_pq",
        # r10 registration (both component operators gate NULL vectors)
        "similarity_recall_audit",
        # r13 registration (the seed/argmax collects and the assignment
        # all run over the shared _gated_vecs NULL-vector gate; the
        # empty/all-NULL degenerate path is additionally pytest-pinned)
        "corpus_coreset_kcenter",
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
        "corpus_split_assignment", "dedup_incremental_ingest",
        "bpe_merge_candidates", "bpe_encode_stats", "corpus_epoch_shuffle", "corpus_mixture_plan", "doc_unigram_score", "dedup_golden_record",
        "media_image_features", "doc_substring_spans",
        "doc_substring_dedup", "corpus_dedup_pipeline",
        "media_audio_windows",
        # r10 registrations (source / text / lang NULLs gated both sides)
        "corpus_domain_cap", "corpus_gopher_rules", "bm25_topk",
        # r11 registrations (text/lang NULLs gated both sides; the
        # staged minhash path inherits dedup_minhash_lsh's gates —
        # signatures exist only for shingled docs).  graph_kcore reads
        # only the never-NULL lineitem key columns, so it has no axis.
        "dedup_minhash_staged", "doc_bigram_score", "corpus_dsir_weights",
        # r12 registrations: the staged twins inherit the inline ops'
        # text/lang gates through the shared scorers AND the staged
        # table's own `text IS NOT NULL` stage filter — probed
        # independently here because the staged table is REBUILT from
        # the NULL-injected fixture (fingerprint differs), so the stage
        # filter itself is under test, not just the scorer.
        "bm25_topk_staged", "doc_bigram_score_staged",
        "corpus_dsir_weights_staged",
        # r13 registration: the substring steady-state twin — probed
        # independently (same rationale as the r12 staged twins: the
        # durable run table REBUILDS from the NULL-injected fixture
        # because its corpus fingerprint differs, so the mining path's
        # text gate is under test, not just the shared coverage step)
        "doc_substring_dedup_staged",
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
