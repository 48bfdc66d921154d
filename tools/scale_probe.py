"""Scale probe: measured evidence that the registered operators scale.

Synthesizes events / orders / lineitem at multiples of the sf0.1 volume
with distributed ``spark.range`` generators (no driver loops, no RNG —
deterministic rows at any parallelism), writes them as
catalog-schema-compatible parquet into a private scratch directory, and
runs a representative slice of ``__spark_entry__.queries()`` UNMODIFIED
against each scale.  For every query it reports two timed runs (the
first includes any per-session staging) and the scaling exponent
``log(t_hi / t_lo) / log(mult_hi / mult_lo)`` on the second runs — an
exponent near 1 is linear, well below 1 is amortized fixed cost, and
well above 1 flags a super-linear shape that would not survive 100x.

Usage: python tools/scale_probe.py [mult ...]   (default: 1 4 10)
Emits one JSON line per (query, mult) and a summary block.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from logistream_data_pipeline_aws_spark.session import get_spark  # noqa: E402

# sf0.1 volumes (TESTDATA.md): the 1x anchor
EVENTS_N = 100_000
ORDERS_N = 150_000
DOCS_N = 5_000

_MONTH_US = 31 * 86_400 * 1_000_000
_EPOCH_2024 = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
_TYPES = ["click", "view", "purchase", "signup", "error"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def synthetic_events(spark: SparkSession, n: int, hot_frac: float = 0.0) -> DataFrame:
    """One month of events, ~n/200 distinct users, 5 types.

    ``hot_frac`` > 0 routes that fraction of all events to a single
    celebrity user (id 0) — the skew axis for the per-user-ordered
    operators (as-of join, sessionization), where one hot key lands an
    entire user's history in one task."""
    users = max(n // 200, 1)
    e = spark.range(n)
    i = F.col("id")
    # spacing precomputed in Python: id * _MONTH_US overflows a long at
    # ~3e3x scale, while id * (month // n) never can
    spacing = max(_MONTH_US // n, 1)
    ts = F.timestamp_micros(F.lit(_EPOCH_2024) + i * F.lit(spacing))
    # type index goes through a prime-modulus hash first: user assignment
    # is an affine map of i, so when the user count shares a factor with
    # 5 any affine-in-i type index is CONSTANT within a user's events —
    # each user had a single event type and the funnel/journey operators
    # saw degenerate input.  pmod by the prime 1000003 (coprime to 5)
    # breaks the residue-class correlation at every mult.
    typ = F.element_at(
        F.array(*[F.lit(t) for t in _TYPES]),
        (F.pmod(F.pmod(i * 48_271 + 11, F.lit(1_000_003)), F.lit(len(_TYPES))) + 1).cast(
            "int"
        ),
    )
    uid = F.pmod(i * 2_654_435_761, F.lit(users))
    if hot_frac > 0:
        uid = F.when(
            F.pmod(i * 48_271, F.lit(1000)) < int(hot_frac * 1000), F.lit(0)
        ).otherwise(uid)
    return e.select(
        i.alias("event_id"),
        ts.alias("ts"),
        uid.alias("user_id"),
        typ.alias("event_type"),
        (F.pmod(i * 13 + 7, F.lit(10_000)).cast("double") / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(i, F.lit(100)), F.lit("}")).alias("props"),
    )


def synthetic_orders_lineitem(
    spark: SparkSession, n_orders: int
) -> tuple[DataFrame, DataFrame]:
    """Orders over ~6.5 years plus 1-4 lineitems each (schema-compatible
    with the catalog's orders / lineitem tables)."""
    custs = max(n_orders // 10, 1)
    o = spark.range(1, n_orders + 1)
    oid = F.col("id")
    odate = F.timestamp_micros(
        F.lit(_EPOCH_2024 - 2400 * 86_400 * 1_000_000)
        + F.pmod(oid * 37, F.lit(2400)) * F.lit(86_400 * 1_000_000)
    )
    orders = o.select(
        oid.alias("o_orderkey"),
        F.pmod(oid * 97, F.lit(custs)).alias("o_custkey"),
        F.when(F.pmod(oid, F.lit(2)) == 0, "F").otherwise("O").alias("o_orderstatus"),
        (F.lit(1000.0) + F.pmod(oid * 11, F.lit(450_000)).cast("double")).alias(
            "o_totalprice"
        ),
        odate.alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(p) for p in _PRIOS]),
            (F.pmod(oid, F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    ex = o.select(
        oid.alias("oid"),
        odate.alias("odate"),
        F.explode(
            F.sequence(F.lit(1), (F.lit(1) + F.pmod(oid, F.lit(4))).cast("int"))
        ).alias("ln"),
    )
    ln = F.col("ln")
    lineitem = ex.select(
        F.col("oid").alias("l_orderkey"),
        F.pmod(F.col("oid") * 31 + ln, F.lit(max(n_orders // 8, 1))).alias(
            "l_partkey"
        ),
        F.pmod(F.col("oid") * 7 + ln, F.lit(max(n_orders // 150, 1))).alias(
            "l_suppkey"
        ),
        ln.cast("int").alias("l_linenumber"),
        (F.lit(1) + F.pmod(F.col("oid") + ln, F.lit(50))).cast("double").alias(
            "l_quantity"
        ),
        (F.lit(900.0) + F.pmod(F.col("oid") * 13 + ln, F.lit(100_000)).cast("double"))
        .alias("l_extendedprice"),
        (F.pmod(F.col("oid") + ln, F.lit(11)).cast("double") / 100.0).alias(
            "l_discount"
        ),
        (F.pmod(F.col("oid") * 3 + ln, F.lit(9)).cast("double") / 100.0).alias(
            "l_tax"
        ),
        F.when(F.pmod(F.col("oid") + ln, F.lit(4)) == 0, "R")
        .otherwise("N")
        .alias("l_returnflag"),
        F.when(F.pmod(F.col("oid"), F.lit(2)) == 0, "F").otherwise("O").alias(
            "l_linestatus"
        ),
        F.timestamp_micros(
            F.unix_micros(F.col("odate"))
            + F.pmod(F.col("oid") * 5 + ln, F.lit(120)) * F.lit(86_400 * 1_000_000)
        ).alias("l_shipdate"),
    )
    return orders, lineitem


_WORDS = [
    "logistics", "shipment", "carrier", "route", "delivery", "pallet",
    "invoice", "customs", "manifest", "freight", "terminal", "transit",
    "warehouse", "dispatch", "tracking", "courier", "container", "lading",
    "port", "linehaul", "depot", "network", "schedule", "forecast",
    "inventory", "backlog", "priority", "express", "standard", "economy",
]


def synthetic_documents(spark: SparkSession, n: int) -> DataFrame:
    """Template-family corpus: ~n/5 base templates of ~60 words, five
    variants each (word substitutions at pmod-picked offsets) — so exact
    dups, near dups, and distinct docs all exist at every scale, and the
    dedup family has real work to do.

    The vocabulary SCALES with the corpus (every 6th slot draws from a
    ~n/50-token synthetic lexicon mixed by family): with only the fixed
    30-word lexicon, family patterns repeat every 30 families, so at
    >=10x EVERY shingle is shared by thousands of documents — the whole
    corpus becomes one hot bucket, the cap drops everything, and the
    probe measures the degenerate-drop path instead of real mining.
    Real corpora have heavy-tailed vocabularies; the scaled lexicon
    restores that shape at any mult (probe numbers from r5 on are not
    comparable to the r4 fixed-vocabulary corpus lines).

    Shared-stretch geometry (VERDICT r12 "What's missing #4"): the
    12-word substitution cycle bounds contiguous shared text between
    variants at 34-38 chars — BELOW doc_substring_spans' min_span=40,
    so the spans operator emitted 0 rows at every probe scale (data-
    real, but a span-zeroing regression would be invisible).  Each doc
    therefore ends with a ~49-char FAMILY-CONSTANT tail whose family
    id repeats every ~10-16 chars: every 20-gram inside it contains
    the id (so gram doc-frequency stays at the 5 family variants, far
    under the max_gram_docs=50 cap), the 5 variants share the whole
    tail as one maximal >=40-char run, and pair volume stays linear
    (C(5,2) pairs per family).  Real duplicated-boilerplate shape —
    and char-scale probe lines from r13 on are ~15% heavier than r12's
    (documented in BUILDLOG r13)."""
    d = spark.range(n)
    i = F.col("id")
    fam = (i / 5).cast("long")
    variant = F.pmod(i, F.lit(5))
    vocab = max(n // 50, 100)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.when(
            F.pmod(j, F.lit(12)) == 6,
            F.concat(F.lit("tok"), F.pmod(fam * 7919 + j, F.lit(vocab))),
        ).otherwise(
            F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                (
                    F.pmod(
                        fam * 31 + j * 7 + F.when(F.pmod(j, F.lit(12)) == 0, variant).otherwise(0),
                        F.lit(len(_WORDS)),
                    )
                    + 1
                ).cast("int"),
            )
        ),
    )
    fam_tag = F.concat(F.lit("f"), fam.cast("string"), F.lit("x"))
    shared_tail = F.concat(
        F.lit(" "), fam_tag, F.lit(" alpha "), fam_tag, F.lit(" bravo "),
        fam_tag, F.lit(" charl "), fam_tag, F.lit(" delta "), fam_tag,
        F.lit(" echos"),
    )
    text = F.concat(F.array_join(words, " "), shared_tail)
    return d.select(
        i.alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("es")),
            (F.pmod(fam, F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(fam, F.lit(4))).alias("source"),
        F.length(text).alias("n_chars"),
    )


EMB_N = 500  # sf0.1 anchor (TESTDATA.md)


def synthetic_embeddings(spark: SparkSession, n: int, dim: int = 64) -> DataFrame:
    """Deterministic unit-free float vectors with a mild cluster
    structure (16 anchor directions + per-vector jitter), schema-matched
    to the embeddings table — enables the similarity family at any
    mult."""
    e = spark.range(n)
    i = F.col("id")
    anchor = F.pmod(i, F.lit(16))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(anchor * 131 + j * 17, F.lit(97)).cast("double") - 48.0) / 48.0
            + (F.pmod(i * 2_654_435_761 + j * 7919, F.lit(1000)).cast("double") - 500.0)
            / 2500.0
        ).cast("float"),
    )
    return e.select(
        i.alias("vec_id"),
        vec.alias("embedding"),
        anchor.cast("int").alias("label"),
    )


def synthetic_customer(spark: SparkSession, n_orders: int) -> DataFrame:
    """Customer dim matching synthetic_orders_lineitem's custkey domain
    (o_custkey = pmod(orderkey*97, n_orders//10)) — segments cycle so the
    per-segment trendline groups stay balanced at every mult."""
    custs = max(n_orders // 10, 1)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = spark.range(0, custs)
    return c.select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        F.pmod(F.col("id"), F.lit(25)).cast("int").alias("c_nationkey"),
        (F.pmod(F.col("id") * 13, F.lit(10_000)).cast("double") - F.lit(1000.0)).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in segs]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )


CORPUS_QUERIES = [
    "corpus_split_assignment",
    # r12: added for 1000x coverage (VERDICT r11 #6)
    "corpus_length_histogram",
    "corpus_epoch_shuffle",
    "bpe_merge_candidates",
    "bpe_encode_stats",
    "doc_unigram_score",
    "dedup_incremental_ingest",
    "dedup_exact",
    "dedup_golden_record",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_near_survivors",
    "dedup_prefix_filter",
    "corpus_quality_filter",
    "doc_winnowing",
    "lang_id",
    "sequence_packing",
    # r11: the remaining text-analysis family, added for 1000x coverage
    "tfidf_top_terms",
    "contamination_check",
    "text_stats",
    "doc_substring_spans",
    "doc_substring_dedup",
    "corpus_dedup_pipeline",
    "corpus_domain_cap",
    "corpus_gopher_rules",
    "bm25_topk",
    # r11 queue (registered at the r11 rotation)
    "dedup_minhash_staged",
    "doc_bigram_score",
    "corpus_dsir_weights",
    # r12 queue: staged BM25 + the staged-token consumers
    "bm25_topk_staged",
    "doc_bigram_score_staged",
    "corpus_dsir_weights_staged",
]
SIMILARITY_QUERIES = [
    # registered at the r13 rotation (the override below is now just a
    # direct resolve — kept so older probe lines stay comparable)
    "corpus_coreset_kcenter",
    "similarity_ivf_pq",
    "similarity_topk",
    "similarity_pq_adc",
    "similarity_pq_refine",
    "embedding_outliers",
    "similarity_ann_lsh",
    "similarity_ivf_kmeans",
    "dedup_embedding",
    "embedding_stats",
    "dedup_semantic",
    "similarity_ivf_incremental",
    "similarity_recall_audit",
]

EVENTS_QUERIES = [
    "events_hourly",
    "events_funnel",
    "events_cohort_retention",
    "scd2_user_state",
    "user_sessions",
    "events_active_users",
    "events_twap",
    "events_gapfill_locf",
    "events_anomaly_mad",
    "events_ohlc",
    "events_transition_matrix",
    "events_heavy_hitters",
    "events_stickiness_hll",
    "events_stickiness_hll_prod",
    "scd2_daily_snapshot",
    "events_upsert_changes",
    "events_upsert_timetravel",
    # r7 probes (VERDICT r6 #7): compaction cost vs file count, and the
    # JDBC MERGE sink's driver DELETE key-list growth (calendar-bounded
    # grain: keys = hours x types, fixed by the window not the volume)
    "warehouse_compaction_audit",
    "events_stream_jdbc_upsert",
    "events_asof_last_purchase",
    "events_conversion_lag",
    "events_stream_sessions",
    "events_stream_sessions_flushed",
    "events_upsert_delete",
    "events_feature_matrix",
]
WAREHOUSE_QUERIES = [
    "lineitem_column_profile",
    "lineitem_column_profile_approx",
    "basket_part_pairs",
    "orders_backlog_series",
    "daily_sales_moving_avg",
    "lineitem_abc_pareto",
    "lineitem_abc_pareto_approx",
    "fact_backfill_plan",
    "sales_trendline_ols",
    "sales_forecast_ses",
    "supplier_pagerank",
    "graph_hop_distance",
    "graph_triangle_count",
    # r11 queue (registers at the r11 rotation)
    "graph_kcore",
]
# Celebrity-key axis: the same per-user-ordered operators re-run on an
# events table where one user owns 30% of all rows.  The merge as-of
# and the applyInPandasWithState sessionizer both group by user, so one
# hot user concentrates that work in one task — the probe line measures
# whether that's a wall-clock cliff or an absorbed imbalance.
SKEW_QUERIES = [
    "events_asof_last_purchase",
    "user_sessions",
    "events_stream_sessions",
    "events_stream_sessions_flushed",
    # r10 queue: the feature windows group by user too — the celebrity
    # user serializes its 30% of all rows through one window task
    "events_feature_matrix",
]


def _probe_stream_sessions(spark: SparkSession, sf_dir: str, flush_idle: bool = False) -> DataFrame:
    """The registered ``events_stream_sessions`` drains its sessions into
    a MEMORY sink — the driver-contract readback, sized for oracle scale
    (sf0.01).  At 100x that readback alone pins ~10M rows in driver heap
    and OOMs the shared probe JVM, so the probe runs the SAME
    applyInPandasWithState pipeline through its production sink shape
    (parquet + checkpoint) and reads the files back.  The stateful
    operator, watermark, and batch shape are identical; only the sink
    differs — which is exactly what a deployment does."""
    import tempfile

    from logistream_data_pipeline_aws_spark.catalog import events_stream
    from logistream_data_pipeline_aws_spark.streaming.pipeline import sessionize

    out = tempfile.mkdtemp(prefix="lsdp_probe_sessions_")
    with events_stream(spark, sf_dir) as stream:
        q = (
            sessionize(stream, flush_idle=flush_idle)
            .writeStream.format("parquet")
            .option("path", os.path.join(out, "data"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 900
        while q.isActive and time.time() < deadline:
            q.awaitTermination(1)
        if q.isActive:
            q.stop()
            raise TimeoutError("probe sessionize drain exceeded 900s")
    return spark.read.parquet(os.path.join(out, "data"))


def _probe_stickiness_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deregistered from queries() in round 7 (no cross-engine oracle for
    # estimates) but still a probed + benched production surface
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        events_stickiness_hll_prod,
    )

    return events_stickiness_hll_prod(spark, sf_dir)


def _staged(name):
    # operators built + pytest-pinned but not yet registered in
    # queries(): resolve from the plans module directly
    from logistream_data_pipeline_aws_spark.plans import extensions as X

    return getattr(X, name)


PROBE_OVERRIDES = {
    "events_stream_sessions": _probe_stream_sessions,
    "events_stream_sessions_flushed": (
        lambda spark, sf_dir: _probe_stream_sessions(spark, sf_dir, flush_idle=True)
    ),
    # deregistered from queries() but still a probed production surface
    "events_stickiness_hll_prod": _probe_stickiness_prod,
    # the r8-staged operators (doc_substring_dedup, similarity_ivf_pq,
    # corpus_dedup_pipeline, media_audio_windows) registered at the r9
    # rotation and now resolve straight from __spark_entry__.queries();
    # their per-op aggregating shims are gone because the probe's
    # DEFAULT consumer (_force_all_columns) defeats the count-time
    # join-elimination hazard for every line.
    # dedup_semantic: the REGISTERED entry pins k=8 so its DuckDB
    # oracle (an unrolled k=8 Lloyd replay) verifies at any SF; the
    # probe measures the scale-honest configuration instead — the
    # corpus-adaptive k the operator defaults to, under which pair
    # mining actually executes at 100x rather than every cluster
    # tripping the size cap (VERDICT r8 what's-wrong #1).
    "dedup_semantic": lambda spark, sf_dir: _staged("dedup_semantic")(
        spark, sf_dir
    ),
    # the r9-staged r10-queue operators (corpus_domain_cap,
    # corpus_gopher_rules, bm25_topk, events_feature_matrix,
    # similarity_recall_audit, graph_triangle_count) registered at the
    # r10 rotation and now resolve straight from queries().
    # the r11-queue operators registered at the r11 rotation, and the
    # r12 queue (staged BM25 + staged-token consumers) at the r12
    # rotation — all resolve straight from queries() now.
    # r13 queue: built + pytest-pinned in r12, registers at the next
    # rotation.
    "corpus_coreset_kcenter": _staged("corpus_coreset_kcenter"),
}


# Measured single-JVM heap floors in GiB per (query, minimum mult that
# needs it) — VERDICT r9 #6: the r9 1000x batch REDISCOVERED the feature
# matrix's memory cliff mid-probe (100M-row user-keyed window sort under
# 32-way task concurrency dies with GCLocker allocation failures at the
# 8g default; completes at 48g).  A single-JVM artifact — a cluster
# spreads the sort across per-executor heaps — but the probe harness
# must know it UP FRONT: the check below fails fast with the required
# `SPARK_GRAFT_DRIVER_MEM` before any corpus write, instead of OOMing
# after the (minutes-long at 1000x) staging pass.  Extend this table
# whenever a probe run hits a heap cliff (record it in BUILDLOG too).
HEAP_FLOORS_GIB: dict[tuple[str, int], int] = {
    ("events_feature_matrix", 1000): 48,
    # r10: the und edge view over 150M orders (~hundreds of millions of
    # rows) GCLocker-OOMs the 8g default under 32-way task concurrency
    ("graph_kcore", 1000): 48,
}


def _jvm_heap_gib() -> float:
    """The heap get_spark will request (env override or its 8g default).
    Parsed here BEFORE the JVM exists so the floor check can fail fast.

    Mirrors Spark's JavaUtils.byteStringAsMb semantics (ADVICE r10 #1):
    a suffix-less value is MiB (NOT bytes — ``'49152'`` means 48 GiB),
    the unit suffix is parsed explicitly, and an unknown suffix raises
    instead of silently mis-scaling the floor check."""
    raw = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g").strip().lower()
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([kmgtp]?)b?", raw)
    if not m:
        raise SystemExit(
            f"unparseable SPARK_GRAFT_DRIVER_MEM={raw!r} "
            "(expected e.g. 8g, 49152m, or a unit-less MiB count)"
        )
    num, unit = float(m.group(1)), m.group(2)
    gib_per_unit = {
        "": 1.0 / 1024.0,  # JavaUtils: unit-less driver memory is MiB
        "k": 1.0 / (1024.0 * 1024.0),
        "m": 1.0 / 1024.0,
        "g": 1.0,
        "t": 1024.0,
        "p": 1024.0 * 1024.0,
    }
    return num * gib_per_unit[unit]


def _check_heap_floor(selected: set[str], mults: list[int]) -> None:
    need = [
        (q, m, gib)
        for (q, m), gib in HEAP_FLOORS_GIB.items()
        if q in selected and any(mm >= m for mm in mults)
    ]
    floor = max((gib for *_qm, gib in need), default=0)
    if floor and _jvm_heap_gib() < floor:
        detail = ", ".join(f"{q}@{m}x needs {gib}g" for q, m, gib in need)
        raise SystemExit(
            f"probe heap too small: SPARK_GRAFT_DRIVER_MEM="
            f"{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')} but {detail} "
            f"(HEAP_FLOORS_GIB) — re-run with SPARK_GRAFT_DRIVER_MEM={floor}g"
        )


def _force_all_columns(df: DataFrame) -> int:
    """The probe's DEFAULT forcing function: a VALUE-DEPENDENT aggregate
    over every output column, not ``.count()``.  A bare count lets
    Catalyst eliminate a LEFT JOIN whose right side has unique keys once
    column pruning drops the right side's columns — a correct
    optimization that silently skips the operator's expensive subtree
    (``doc_substring_dedup`` timed 0.6 s under count where the real
    pipeline costs ~60 s, BUILDLOG r8 "Probe hazard").

    Per-column ``count`` is NOT enough: when an output column is
    provably non-null (a COALESCE'd boolean, a window rank), Catalyst
    rewrites ``count(col)`` to ``count(1)``, prunes the column, and the
    elimination fires anyway — corpus_gopher_rules "ran" its 100x line
    in 0.55 s that way while the real pipeline costs ~78 s (caught by
    an independent re-run, r9).  ``xxhash64`` over every column cannot
    be constant-folded or pruned (the result depends on every value),
    so every join input and window stays alive; hash-unsupported types
    (maps, incl. nested in structs/arrays) are detected UP FRONT from
    the schema and routed through ``to_json`` — the old catch-any
    fallback silently re-ran the whole pipeline inside the timed window
    on ANY transient failure, inflating that line and switching it to a
    different consumer than its peers (ADVICE r9 #2)."""
    cols = [F.col(c) for c in df.columns]
    if any("map<" in dt for _, dt in df.dtypes):
        hash_col = F.xxhash64(F.to_json(F.struct(*cols)))
    else:
        hash_col = F.xxhash64(*cols)
    row = df.select(
        F.count(F.lit(1)).alias("_n"),
        F.bit_xor(hash_col).alias("_h"),
    ).collect()[0]
    return row["_n"]


def _drop_stream_sinks(spark: SparkSession) -> None:
    """Release in-memory streaming sink tables between probe lines: the
    streaming entries drain into memory-format sinks (the driver-contract
    readback), which at 100x is ~10M rows PINNED IN DRIVER HEAP per run —
    two retained sinks OOMed the probe JVM before this.  Production would
    use a real sink; the probe measures the pipeline and then frees the
    readback."""
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name.endswith("_sink"):
            spark.catalog.dropTempView(t.name)


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 10]
    # SCALE_PROBE_ONLY=a,b,c restricts the sweep to named queries (the
    # targeted re-probe path — e.g. the entries a verdict flags)
    only = {
        q for q in os.environ.get("SCALE_PROBE_ONLY", "").split(",") if q
    }
    # a name in no probe list would otherwise exit silently AFTER the
    # expensive corpus write — the builder lost two probe sessions to
    # that in r8 (VERDICT r8 What's-wrong #2): fail before any work
    known = set(
        EVENTS_QUERIES
        + WAREHOUSE_QUERIES
        + CORPUS_QUERIES
        + SIMILARITY_QUERIES
        + SKEW_QUERIES
    )
    unmatched = only - known
    if unmatched:
        raise SystemExit(
            f"SCALE_PROBE_ONLY names matched by no probe list: "
            f"{sorted(unmatched)} — known probe names: {sorted(known)}"
        )
    _check_heap_floor(only or known, mults)
    spark = get_spark("scale-probe")
    # the ts-unit sniffer requires a real parquet timestamp type, not INT96
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    root = tempfile.mkdtemp(prefix="lsdp_scale_probe_")
    queries = {**E.queries(), **PROBE_OVERRIDES}
    results: dict[str, dict[int, float]] = {}
    # SCALE_PROBE_TABLES=events,documents restricts corpus writes to the
    # tables the selected queries actually read — at 1000x the unused
    # orders/lineitem write alone costs minutes (375M generated rows)
    wanted = {
        t for t in os.environ.get("SCALE_PROBE_TABLES", "").split(",") if t
    } or None

    def want(t: str) -> bool:
        return wanted is None or t in wanted

    for m in mults:
        sf_dir = os.path.join(root, f"x{m}")
        os.makedirs(sf_dir, exist_ok=True)
        if want("events"):
            synthetic_events(spark, EVENTS_N * m).coalesce(4).write.mode(
                "overwrite"
            ).parquet(os.path.join(sf_dir, "events.parquet"))
        if want("orders") or want("lineitem"):
            orders, lineitem = synthetic_orders_lineitem(spark, ORDERS_N * m)
            orders.coalesce(4).write.mode("overwrite").parquet(
                os.path.join(sf_dir, "orders.parquet")
            )
            lineitem.coalesce(8).write.mode("overwrite").parquet(
                os.path.join(sf_dir, "lineitem.parquet")
            )
        if want("customer"):
            synthetic_customer(spark, ORDERS_N * m).coalesce(2).write.mode(
                "overwrite"
            ).parquet(os.path.join(sf_dir, "customer.parquet"))
        if want("documents"):
            synthetic_documents(spark, DOCS_N * m).coalesce(4).write.mode(
                "overwrite"
            ).parquet(os.path.join(sf_dir, "documents.parquet"))
        if want("embeddings"):
            synthetic_embeddings(spark, EMB_N * m).coalesce(4).write.mode(
                "overwrite"
            ).parquet(os.path.join(sf_dir, "embeddings.parquet"))
        for name in EVENTS_QUERIES + WAREHOUSE_QUERIES + CORPUS_QUERIES + SIMILARITY_QUERIES:
            if only and name not in only:
                continue
            walls = []
            try:
                for _ in range(2):
                    t0 = time.time()
                    n = _force_all_columns(queries[name](spark, sf_dir))
                    walls.append(round(time.time() - t0, 3))
            except Exception as exc:  # a failing line is data, not a crash
                print(json.dumps({"query": name, "mult": m, "error": repr(exc)[:200]}))
                continue
            results.setdefault(name, {})[m] = walls[-1]
            print(
                json.dumps(
                    {"query": name, "mult": m, "rows": n, "wall_s": walls}
                )
            )
            _drop_stream_sinks(spark)
        # skew axis: same mult, 30% of events on one celebrity user
        if only and not (only & set(SKEW_QUERIES)):
            continue
        skew_dir = os.path.join(root, f"x{m}_skew")
        os.makedirs(skew_dir, exist_ok=True)
        synthetic_events(spark, EVENTS_N * m, hot_frac=0.30).coalesce(4).write.mode(
            "overwrite"
        ).parquet(os.path.join(skew_dir, "events.parquet"))
        for name in SKEW_QUERIES:
            if only and name not in only:
                continue
            walls = []
            try:
                for _ in range(2):
                    t0 = time.time()
                    n = _force_all_columns(queries[name](spark, skew_dir))
                    walls.append(round(time.time() - t0, 3))
            except Exception as exc:
                print(
                    json.dumps(
                        {"query": name + "@skew", "mult": m, "error": repr(exc)[:200]}
                    )
                )
                continue
            results.setdefault(name + "@skew", {})[m] = walls[-1]
            print(
                json.dumps(
                    {"query": name + "@skew", "mult": m, "rows": n, "wall_s": walls}
                )
            )
            _drop_stream_sinks(spark)
    if len(mults) >= 2:
        lo, hi = mults[0], mults[-1]
        summary = {}
        for name, by_m in results.items():
            if by_m.get(lo) and by_m.get(hi) and by_m[lo] > 0:
                summary[name] = round(
                    math.log(by_m[hi] / by_m[lo]) / math.log(hi / lo), 2
                )
        print(json.dumps({"scaling_exponent": summary, "mults": mults}))
    spark.stop()


if __name__ == "__main__":
    main()
