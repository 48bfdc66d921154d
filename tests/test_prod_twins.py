"""Tolerance pins for the sketch-only PRODUCTION twins (VERDICT r6
next-round #2): these forms are deregistered from the driver's oracle
gate — HLL estimates and sketch cutpoints have no cross-engine value
oracle by construction — so their correctness evidence lives here,
pinned against the driver-verified CHECKED forms:

- ``events_stickiness_hll_prod`` estimates must sit within the same 10%
  band of the exact trailing distincts that the checked form's verdict
  booleans assert (``events_stickiness_hll`` wau_ok/mau_ok);
- ``customer_rfm_scores_approx_prod`` scores must sit within the
  documented +/-2 tie window of the exact-cutpoint scores
  (``customer_rfm_scores``), the same bound
  ``customer_rfm_scores_approx_checked`` folds into its verdicts.

Both twins also stay in ``bench.py`` (their whole point is the cheaper
100 TB plan shape)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_stickiness_hll_prod_within_band_of_checked(spark):
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        events_stickiness_hll,
        events_stickiness_hll_prod,
    )

    prod = {
        r.day: (r.wau_est, r.mau_est, r.stickiness_est)
        for r in events_stickiness_hll_prod(spark, SF_SMALL).collect()
    }
    checked = {
        r.day: (r.wau_exact, r.mau_exact, r.stickiness, r.wau_ok, r.mau_ok)
        for r in events_stickiness_hll(spark, SF_SMALL).collect()
    }
    assert set(prod) == set(checked) and prod
    for day, (wau_est, mau_est, stick_est) in prod.items():
        wau_exact, mau_exact, stick, wau_ok, mau_ok = checked[day]
        # the checked form's own verdicts hold...
        assert wau_ok and mau_ok, day
        # ...and the prod projection emits the same estimates the checked
        # form certified (same sketch path), within the 10% band
        assert abs(wau_est - wau_exact) <= 0.10 * wau_exact, day
        assert abs(mau_est - mau_exact) <= 0.10 * mau_exact, day
        assert stick_est > 0 and abs(stick_est - stick) <= 0.25, day


def test_rfm_prod_within_tie_window_of_exact(spark):
    from logistream_data_pipeline_aws_spark.plans.analytics import (
        customer_rfm_scores,
    )
    from logistream_data_pipeline_aws_spark.plans.extensions import (
        customer_rfm_scores_approx_prod,
    )

    approx = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in customer_rfm_scores_approx_prod(spark, SF_SMALL).collect()
    }
    exact = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in customer_rfm_scores(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact) and approx
    for k, a in approx.items():
        e = exact[k]
        for name, ai, ei in zip(("r", "f", "m"), a, e):
            assert abs(ai - ei) <= 2, (k, name, ai, ei)
        # scores stay in the quintile range
        assert all(1 <= s <= 5 for s in a), k


# -- deregistered composition aliases (registry-cap endgame, r12) ------------

# The oracle sql_profit_by_hierarchy carried while registered (moved
# here verbatim at its r12 deregistration — COVERAGE "Registry-cap
# endgame" shortlist #1, the first executed slot-free).  The replay
# below keeps the deregistered entry under the SAME cross-engine value
# check the driver gate ran, every CI run.
SQL_PROFIT_BY_HIERARCHY_ORACLE = (
    "SELECT p.p_brand, p.p_type, "
    "CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) "
    "AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue, "
    "COUNT(*) AS n_items "
    "FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey "
    "GROUP BY p.p_brand, p.p_type"
)


def test_deregistered_sql_profit_by_hierarchy_oracle_replay(spark):
    """Oracle-replay pin for the first registry-cap deregistration: the
    pure-SQL twin left queries() at the r12 rotation (its slot freed for
    new registrations), so its DuckDB value check moves from the driver
    gate into CI.  Together with test_skew_sql.py::test_sql_surface_
    matches_dataframe_plan (bit-exact vs the REGISTERED
    a5_profit_by_hierarchy) the twin stays double-pinned."""
    import duckdb

    from logistream_data_pipeline_aws_spark.plans.sql_views import (
        sql_profit_by_hierarchy,
    )

    got = {
        (r.p_brand, r.p_type): (r.total_revenue, r.n_items)
        for r in sql_profit_by_hierarchy(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    exp = {
        (b, t): (rev, n)
        for b, t, rev, n in con.execute(
            SQL_PROFIT_BY_HIERARCHY_ORACLE
        ).fetchall()
    }
    assert got == exp and got
