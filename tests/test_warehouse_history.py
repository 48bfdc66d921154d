"""Unit tests for the round-4-continuation warehouse surface: SCD Type 2
history build, the staging integrity audit, the stratified sampler's
salted-two-stage == single-window equivalence, and the Q21-shape plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.operators.dimensions import scd2_history


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_scd2_history_collapses_runs(spark):
    rows = [
        # user 1: A A B A  -> 3 versions (A, B, A)
        (1, _ts(1), 1, "A"),
        (2, _ts(2), 1, "A"),
        (3, _ts(3), 1, "B"),
        (4, _ts(4), 1, "A"),
        # user 2: single event -> one current version
        (5, _ts(1), 2, "Z"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "state"])
    out = scd2_history(df, "user_id", "state", "ts", "event_id")
    got = {
        (r.user_id, r.version): (r.state, r.effective_from, r.effective_to, r.n_events, r.is_current)
        for r in out.collect()
    }
    assert got[(1, 1)] == ("A", _ts(1), _ts(3), 2, False)
    assert got[(1, 2)] == ("B", _ts(3), _ts(4), 1, False)
    assert got[(1, 3)] == ("A", _ts(4), None, 1, True)
    assert got[(2, 1)] == ("Z", _ts(1), None, 1, True)


def test_scd2_history_null_state_forms_runs(spark):
    # NULL is a real state: consecutive NULLs collapse into ONE run (the
    # null-safe compare), and a leading NULL still opens version 1
    rows = [
        (1, _ts(1), 1, None),
        (2, _ts(2), 1, None),
        (3, _ts(3), 1, "A"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, state string")
    out = scd2_history(df, "user_id", "state", "ts", "event_id")
    got = {r.version: (r.state, r.n_events, r.is_current) for r in out.collect()}
    assert got[1] == (None, 2, False)
    assert got[2] == ("A", 1, True)


def test_stratified_sample_matches_single_window_reference(spark):
    """The salted two-stage top-k must equal the naive one-window rank —
    the scale decomposition is a pure rewrite, not an approximation."""
    from pyspark.sql import Window

    from logistream_data_pipeline_aws_spark.plans.extensions import (
        corpus_stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.sample_rank)
        for r in corpus_stratified_sample(spark, sf, k=7).collect()
    }
    from logistream_data_pipeline_aws_spark.catalog import load_table

    docs = load_table(spark, "documents", sf)
    u = F.md5(F.concat(F.lit("strat#"), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(u.alias("_u"), "doc_id")
    ref = {
        (r.doc_id, r.sample_rank)
        for r in docs.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= 7)
        .collect()
    }
    assert got == ref and len(got) > 0


def test_integrity_audit_counts_orphans_and_nulls(spark, tmp_path):
    """Inject one orphan lineitem and a NULL orderdate into a copied
    fixture dir; the audit must count exactly those."""
    import glob
    import os

    base = "/root/testdata/sf0.001"
    d = str(tmp_path / "broken")
    os.makedirs(d)
    for p in glob.glob(base + "/*.parquet"):
        t = os.path.basename(p)
        if t not in ("lineitem.parquet", "orders.parquet"):
            os.symlink(p, os.path.join(d, t))
    li = spark.read.parquet(base + "/lineitem.parquet")
    bad = li.limit(1).withColumn("l_orderkey", F.lit(999999999))
    li.unionByName(bad).coalesce(1).write.parquet(d + "/lineitem.parquet")
    orders = spark.read.parquet(base + "/orders.parquet")
    bad_o = orders.limit(1).withColumn(
        "o_orderdate", F.lit(None).cast("timestamp")
    ).withColumn("o_orderkey", F.lit(888888888))
    orders.unionByName(bad_o).coalesce(1).write.parquet(d + "/orders.parquet")

    from logistream_data_pipeline_aws_spark.plans.extensions import (
        warehouse_integrity_audit,
    )

    rep = {r.check_name: (r.n_scanned, r.n_bad) for r in warehouse_integrity_audit(spark, d).collect()}
    n_li = li.count() + 1
    assert rep["lineitem_orphan_orderkey"] == (n_li, 1)
    assert rep["orders_null_orderdate"][1] == 1
    assert rep["lineitem_orphan_partkey"][1] == 0
    assert rep["nation_orphan_regionkey"][1] == 0


def test_waiting_suppliers_plan_decorrelates(spark):
    """The Q21-shape double-correlated EXISTS/NOT EXISTS must plan as
    semi + anti hash joins (no per-row subquery, no cartesian)."""
    from logistream_data_pipeline_aws_spark.plans.sql_views import (
        sql_waiting_suppliers,
    )

    plan = sql_waiting_suppliers(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ivf_kmeans_matches_numpy_replica(spark):
    """The fixed-seed 2-round Lloyd build must match an independent numpy
    implementation of the same spec (first-k seeding, (d2, cid) argmin
    tie-break, per-dim mean) on assignments."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.catalog import load_table
    from logistream_data_pipeline_aws_spark.operators.similarity import (
        ivf_kmeans_assign,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf)
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    mat = np.stack([t[1] for t in rows])
    k = 4
    cents = mat[ids < k].copy()
    cent_ids = list(range(k))
    for _ in range(2):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties break on lower index == lower cid
        cents = np.stack([mat[assign == j].mean(axis=0) for j in range(len(cent_ids))])
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expected = dict(zip(ids.tolist(), d2.argmin(axis=1).tolist()))

    got = {
        r.vec_id: r.list_id
        for r in ivf_kmeans_assign(emb, "vec_id", "embedding", k=k, iters=2).collect()
    }
    assert got == expected
    assert len(set(got.values())) == k  # no list collapsed on this fixture


def test_exact_heavy_hitters_matches_plain_groupby(spark):
    """Skewed fixture with distinct keys >> MG capacity: the two-phase
    result must still equal the unbounded GROUP BY ... HAVING (the MG
    pass is a candidate superset, never a filter on truth)."""
    from logistream_data_pipeline_aws_spark.operators.frequency import (
        exact_heavy_hitters,
    )

    # 3 heavy keys (600 rows) + 2000 singleton keys; capacity 50 << 2003
    rows = [(k,) for k in ("hot1",) * 300 + ("hot2",) * 200 + ("hot3",) * 100]
    rows += [(f"cold{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    got = {
        (r.k, r.n_rows)
        for r in exact_heavy_hitters(df, ["k"], threshold_denom=50, capacity=50).collect()
    }
    n = len(rows)
    ref = {
        (r.k, r.cnt)
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).where(F.col("cnt") > n / 50.0).collect()
    }
    assert got == ref
    assert {k for k, _ in got} == {"hot1", "hot2", "hot3"}


def test_scd2_daily_snapshot_day_end_semantics(spark, tmp_path):
    """Point-in-time snapshot picks the version valid at DAY END: a
    mid-day state change means that day's snapshot shows the later
    state; a user appears from their first-sighting day through the
    feed's last day, carrying the last state forward."""
    from logistream_data_pipeline_aws_spark.catalog import TESTDATA_SCHEMAS
    from logistream_data_pipeline_aws_spark.plans.extensions import scd2_daily_snapshot

    def ev(eid, day, hour, uid, typ):
        return (eid, dt.datetime(2024, 1, day, hour), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 10, 1, "A"),   # day1: A then B -> day-end snapshot = B
        ev(2, 1, 14, 1, "B"),
        ev(3, 3, 9, 1, "A"),    # day2 carries B; day3 flips back to A
        ev(4, 4, 12, 2, "C"),   # user 2 first seen day4 (also feed max day)
    ]
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.createDataFrame(
        rows, TESTDATA_SCHEMAS["events"]
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.user_id, r.snapshot_date.isoformat()): (r.state, r.version)
        for r in scd2_daily_snapshot(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, "2024-01-01"): ("B", 2),
        (1, "2024-01-02"): ("B", 2),
        (1, "2024-01-03"): ("A", 3),
        (1, "2024-01-04"): ("A", 3),
        (2, "2024-01-04"): ("C", 1),
    }


def test_lineitem_column_profile_counts(spark, tmp_path):
    """Profile counts NULLs and exact distincts per column in one pass;
    n_rows is the table count for every column (stack emits NULL rows),
    and null_frac is the int/int division of the two."""
    from logistream_data_pipeline_aws_spark.catalog import TESTDATA_SCHEMAS
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        lineitem_column_profile,
    )

    rows = [
        (1, 10, 100, 1, 5.0, 100.0, 0.1, 0.02, "N", "O", dt.datetime(1995, 1, 1)),
        (1, 11, 100, 2, None, 100.0, 0.1, 0.02, None, "O", None),
        (2, 10, 101, 1, 5.0, 200.0, None, 0.02, "R", "F", dt.datetime(1995, 1, 2)),
    ]
    spark.createDataFrame(rows, TESTDATA_SCHEMAS["lineitem"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    prof = {
        r.column_name: r
        for r in lineitem_column_profile(spark, str(tmp_path)).collect()
    }
    assert set(prof) == {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    }
    assert all(r.n_rows == 3 for r in prof.values())
    assert (prof["l_quantity"].n_null, prof["l_quantity"].n_distinct) == (1, 1)
    assert (prof["l_returnflag"].n_null, prof["l_returnflag"].n_distinct) == (1, 2)
    assert (prof["l_orderkey"].n_null, prof["l_orderkey"].n_distinct) == (0, 2)
    assert (prof["l_shipdate"].n_null, prof["l_shipdate"].n_distinct) == (1, 2)
    assert prof["l_discount"].null_frac == 1 / 3


def test_pq_adc_matches_numpy_replica(spark):
    """The PQ train/encode/ADC pipeline must match an independent numpy
    implementation of the same spec (per-subspace first-k seeding, 2
    Lloyd rounds, (d2, cid) argmin tie-break, ADC = sum of per-subspace
    lookup distances) on the ranked top-k ids."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.catalog import load_table
    from logistream_data_pipeline_aws_spark.operators.pq import pq_adc_topk

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf)
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    mat = np.stack([t[1] for t in rows])
    m, k, sub, nq, ktop = 4, 8, 16, 3, 10

    codes = np.zeros((len(ids), m), dtype=int)
    cents_by_s = []
    for s in range(m):
        sv = mat[:, s * sub : (s + 1) * sub]
        cents = sv[ids < k].copy()
        for _ in range(2):
            d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            cents = np.stack([sv[assign == j].mean(axis=0) for j in range(k)])
        d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
        cents_by_s.append(cents)

    expected = {}
    for qi in range(nq):
        approx = np.zeros(len(ids))
        for s in range(m):
            qv = mat[ids == qi][0, s * sub : (s + 1) * sub]
            lut = ((cents_by_s[s] - qv[None, :]) ** 2).sum(axis=1)
            approx += lut[codes[:, s]]
        order = sorted(
            (round(d, 9), int(v)) for d, v in zip(approx, ids) if v != qi
        )
        expected[qi] = [v for _, v in order[:ktop]]

    got = pq_adc_topk(
        emb, "vec_id", "embedding", dim=64, m=m, k=k, iters=2,
        n_queries=nq, k_top=ktop,
    ).collect()
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        got_by_q.setdefault(r.query_id, []).append(r.candidate_id)
    assert got_by_q == expected


def test_embedding_outliers_matches_numpy_and_uses_takeordered(spark):
    """z-scored centroid distances must match a numpy replica (same
    moment math) on the ranked ids, and the top-k cut must plan as
    TakeOrdered — per-task heaps, never a global sort Exchange."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.plans.extensions import (
        embedding_outliers,
    )

    sf = "/root/testdata/sf0.001"
    df = embedding_outliers(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    mat = np.stack([np.array(r.embedding, dtype=np.float64) for r in emb])
    cent = mat.mean(axis=0)
    d2 = ((mat - cent) ** 2).sum(axis=1)
    z = (d2 - d2.mean()) / np.sqrt((d2 ** 2).mean() - d2.mean() ** 2)
    order = sorted(zip(-z, ids))[:20]
    expected = [int(i) for _, i in order]

    got = [r.vec_id for r in sorted(df.collect(), key=lambda r: r.rank)]
    assert got == expected
    # and the emitted zscores agree with numpy to float tolerance
    z_by_id = dict(zip(ids.tolist(), z.tolist()))
    for r in df.collect():
        assert abs(r.zscore - z_by_id[r.vec_id]) < 1e-5


def test_fact_backfill_plan_action_thresholds(spark):
    """Every month's counts must partition into insert/delete/update,
    the change fraction must equal n_changed/n_total, and the action
    must flip exactly at the 20% threshold."""
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        fact_backfill_plan,
    )

    rows = fact_backfill_plan(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_changed == r.n_inserts + r.n_deletes + r.n_updates
        assert abs(r.change_frac - r.n_changed / r.n_total) < 1e-15
        assert r.action == (
            "rewrite_partition" if r.change_frac > 0.2 else "merge_rows"
        )
    # the deterministic carve touches ~3/10 of keys per month on
    # average, so the dense-change action must actually fire
    assert any(r.action == "rewrite_partition" for r in rows)


def test_sales_trendline_ols_matches_numpy(spark):
    """Closed-form moment OLS must equal numpy.polyfit on the same
    (day, daily revenue) points per segment."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.plans.extensions import (
        sales_trendline_ols,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.c_mktsegment: r for r in sales_trendline_ols(spark, sf).collect()}

    import duckdb
    daily = duckdb.sql(f"""
        SELECT c_mktsegment, CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x,
               SUM(o_totalprice) AS y
        FROM '{sf}/orders.parquet' o JOIN '{sf}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
    """).fetchall()
    by_seg: dict = {}
    for seg, x, y in daily:
        by_seg.setdefault(seg, []).append((x, float(y)))
    for seg, pts in by_seg.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        g = got[seg]
        assert g.n_days == len(pts)
        assert abs(g.slope - slope) < 1e-4 * max(1, abs(slope))
        assert abs(g.intercept - intercept) < 1e-4 * max(1, abs(intercept))
        assert abs(g.r2 - r * r) < 1e-6


def test_pq_refine_matches_numpy_and_improves_on_adc(spark):
    """pq_refine_topk: the exact re-rank over the ADC shortlist must
    match a numpy replica (shortlist by the same approx ranking, exact
    d2 re-rank), and the refined top-k must be at least as close to the
    brute-force exact top-k as the raw ADC ranking is (the shortlist
    boundary is the only recall loss)."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.catalog import load_table
    from logistream_data_pipeline_aws_spark.operators.pq import (
        pq_adc_topk,
        pq_refine_topk,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf)
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    mat = np.stack([t[1] for t in rows])
    m, k, sub, nq, kshort, ktop = 4, 8, 16, 3, 50, 10

    # replicate training + codes (same spec as the ADC test)
    codes = np.zeros((len(ids), m), dtype=int)
    cents_by_s = []
    for s in range(m):
        sv = mat[:, s * sub : (s + 1) * sub]
        cents = sv[ids < k].copy()
        for _ in range(2):
            d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            cents = np.stack([sv[assign == j].mean(axis=0) for j in range(k)])
        d2 = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
        cents_by_s.append(cents)

    expected, adc_recall, refine_recall = {}, [], []
    for qi in range(nq):
        qvec = mat[ids == qi][0]
        approx = np.zeros(len(ids))
        for s in range(m):
            qv = qvec[s * sub : (s + 1) * sub]
            lut = ((cents_by_s[s] - qv[None, :]) ** 2).sum(axis=1)
            approx += lut[codes[:, s]]
        shortlist = [
            v for _, v in sorted(
                (round(d, 9), int(v)) for d, v in zip(approx, ids) if v != qi
            )[:kshort]
        ]
        exact_sh = sorted(
            (((mat[ids == v][0] - qvec) ** 2).sum(), v) for v in shortlist
        )
        expected[qi] = [v for _, v in exact_sh[:ktop]]
        # brute-force exact top-k over the whole corpus
        exact_all = sorted(
            (((vec - qvec) ** 2).sum(), int(v))
            for v, vec in zip(ids, mat) if v != qi
        )
        truth = {v for _, v in exact_all[:ktop]}
        adc_ids = [
            v for _, v in sorted(
                (round(d, 9), int(v)) for d, v in zip(approx, ids) if v != qi
            )[:ktop]
        ]
        adc_recall.append(len(truth & set(adc_ids)) / ktop)
        refine_recall.append(len(truth & set(expected[qi])) / ktop)

    got = pq_refine_topk(
        emb, "vec_id", "embedding", dim=64, m=m, k=k, iters=2,
        n_queries=nq, k_shortlist=kshort, k_top=ktop,
    ).collect()
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        got_by_q.setdefault(r.query_id, []).append(r.candidate_id)
    assert got_by_q == expected
    # refinement can only help: exact re-rank inside the shortlist
    assert all(r >= a for r, a in zip(refine_recall, adc_recall)), (
        refine_recall, adc_recall,
    )


def test_sales_forecast_ses_matches_numpy(spark):
    """The SES fold must equal the numpy recursion s_t = a*x_t +
    (1-a)*s_{t-1} over the day-ordered series, per segment."""
    import numpy as np

    from logistream_data_pipeline_aws_spark.catalog import load_table
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        sales_forecast_ses,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, "orders", sf)
    customer = load_table(spark, "customer", sf)
    daily = (
        orders.where(F.col("o_orderdate").isNotNull())
        .join(customer.select("c_custkey", "c_mktsegment"),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
             .cast("double").alias("y"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.c_mktsegment, []).append((r.d, r.y))
    expected = {}
    for seg, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        s = ys[0]
        for v in ys[1:]:
            s = 0.5 * v + 0.5 * s
        expected[seg] = (len(ys), round(ys[-1], 6), round(s, 6))
    got = {
        r.c_mktsegment: (r.n_days, r.last_actual, r.ses_level)
        for r in sales_forecast_ses(spark, sf).collect()
    }
    assert got == expected
    for r in sales_forecast_ses(spark, sf).collect():
        assert r.forecast_next == r.ses_level
