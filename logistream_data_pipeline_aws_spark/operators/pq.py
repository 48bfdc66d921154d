"""Product quantization (PQ) for embedding columns — codebook
training, corpus encoding, and asymmetric-distance (ADC) top-k.

Kept in its own module (the ``operators.incremental`` precedent): the
rotation ledger digests a helper module's FILE for every entry that
references it by attribute, so extending ``operators.similarity``
in-place would churn the digest of six digest-pinned tail entries.

Same determinism contract as ``similarity.ivf_kmeans_assign`` (left-fold
d2, DECIMAL(30,8) means and partial sums, (d2, cid) argmin tie-break),
so the full train/encode/score pipeline replays hash-exactly in an
unrolled SQL oracle (``__spark_entry__._pq_oracle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pq_subspaces(vecs: DataFrame, m: int, sub: int) -> DataFrame:
    """Explode ``(_vid, _v)`` into ``(_vid, _sid, _sv)`` — one row per
    subspace, ``_sv`` the contiguous ``sub``-wide slice.  Static slice
    positions keep the whole explode inside codegen (inline over an
    array-of-structs literal, no shuffle)."""
    parts = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("_sid"),
                F.slice("_v", s * sub + 1, sub).alias("_sv"),
            )
            for s in range(m)
        ]
    )
    return vecs.select("_vid", F.inline(parts))


def pq_codes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization codebook training: split each ``dim``-wide
    vector into ``m`` contiguous subspaces and k-means each subspace
    independently (deterministic first-``k``-by-id seeding, ``iters``
    Lloyd rounds, the exact spec of ``ivf_kmeans_assign``).  All ``m``
    codebooks train in ONE unrolled loop: the subspace id ``_sid`` rides
    as a grouping key, so the plan size is that of a single k-means
    regardless of ``m``.

    Returns ``(codes, centroids)``: ``codes`` = one row per (vector,
    subspace) with the assigned code and its squared subdistance;
    ``centroids`` = the trained codebooks (``_sid, _cid, _cv``).

    Engine-exact by the repo's determinism contract — left-fold d2,
    DECIMAL(30,8) means, (d2, cid) argmin tie-break — so an unrolled SQL
    oracle replays the training bit-for-bit.

    Scale shape per iteration: the codebooks are ``m*k`` tiny rows
    broadcast into a map-side score; the argmin window partitions by
    (vector, subspace) — uniform; the mean recompute shuffles on
    (subspace, code, dim) = ``m*k*sub`` groups.  The corpus never
    self-joins; memory per executor is bounded by the broadcast
    codebook, so the build holds at any corpus size."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    from logistream_data_pipeline_aws_spark.operators.dedup_family import (
        parallelize_cpu_stage,
    )

    # NULL-vector rows are ungateable into subspaces (and would win every
    # argmin under Spark's NULLS FIRST) — same gate as ivf_kmeans_assign;
    # parallelized for the same reason (the per-subspace fold scoring
    # inherits a small scan's single partition otherwise)
    vecs = parallelize_cpu_stage(
        df.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("_vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
    )
    parts = _pq_subspaces(vecs, m, sub)
    spark = df.sparkSession
    from logistream_data_pipeline_aws_spark.operators.similarity import (
        _literal_argmin_max_k,
        _sql_argmin,
    )

    if k <= _literal_argmin_max_k(spark):
        # k-gated driver-literal codebooks (r15, the similarity._nearest
        # _literal discipline): per Lloyd round the assign is an IN-ROW
        # argmin against literal centroids dispatched by a CASE on _sid
        # (only the matching branch evaluates, so per-row fold work is
        # exactly k — the same as the broadcast-join expansion), and the
        # means come back as m*k*sub tiny collected rows.  Zero assign
        # exchange; values bit-identical (same left-fold d2, same
        # (d2, cid) lexicographic winner).
        def _collect_cbs(rows) -> dict[int, list[tuple[int, list]]]:
            cbs: dict[int, list[tuple[int, list]]] = {}
            for sid, cid, vec in rows:
                cbs.setdefault(int(sid), []).append(
                    (int(cid), [float(x) for x in vec])
                )
            return {sid: sorted(lst) for sid, lst in cbs.items()}

        cbs = _collect_cbs(
            (r["_sid"], r["_vid"], r["_sv"])
            for r in parts.where(F.col("_vid") < k).collect()
        )

        def assign_literal(cbs: dict) -> DataFrame:
            if not cbs:
                return parts.select(
                    "_vid",
                    "_sid",
                    "_sv",
                    F.lit(None).cast("int").alias("_cid"),
                    F.lit(None).cast("double").alias("_d2"),
                ).where(F.lit(False))
            # ONE SQL string for the whole _sid-dispatched argmin (the
            # _sql_argmin py4j-batching discipline); only the matching
            # CASE branch evaluates per row
            m_expr = F.expr(
                "CASE "
                + " ".join(
                    f"WHEN _sid = {int(sid)} THEN "
                    + _sql_argmin("_sv", cbs[sid])
                    for sid in sorted(cbs)
                )
                + " END"
            )
            return parts.select(
                "_vid",
                "_sid",
                "_sv",
                m_expr.getField("_cid").alias("_cid"),
                m_expr.getField("_d2").alias("_d2"),
            )

        for _ in range(iters):
            if not cbs:
                break
            mean_rows = (
                assign_literal(cbs)
                .select("_sid", "_cid", F.posexplode("_sv").alias("_pos", "_x"))
                .groupBy("_sid", "_cid", "_pos")
                .agg(
                    (
                        F.sum(F.col("_x").cast("decimal(30,8)")).cast("double")
                        / F.count(F.lit(1))
                    ).alias("_mu")
                )
                .collect()
            )
            by_key: dict[tuple[int, int], dict[int, float]] = {}
            for r in mean_rows:
                by_key.setdefault((int(r["_sid"]), int(r["_cid"])), {})[
                    int(r["_pos"])
                ] = r["_mu"]
            cbs = _collect_cbs(
                (sid, cid, [vals[p] for p in sorted(vals)])
                for (sid, cid), vals in by_key.items()
            )
        codes = assign_literal(cbs).select("_vid", "_sid", "_cid", "_d2")
        cents = spark.createDataFrame(
            [
                (sid, cid, cv)
                for sid in sorted(cbs)
                for cid, cv in cbs[sid]
            ],
            "_sid int, _cid int, _cv array<double>",
        )
        return codes, cents

    cents = parts.where(F.col("_vid") < k).select(
        "_sid", F.col("_vid").cast("int").alias("_cid"), F.col("_sv").alias("_cv")
    )
    def assign(cents_df: DataFrame) -> DataFrame:
        # argmin as a map-side-combinable min(struct) instead of a
        # row_number window — same (d2, cid) tie-break, k-fold fewer
        # shuffled rows, no sort (see similarity._nearest, r14)
        d2 = F.aggregate(
            F.zip_with("_sv", "_cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return (
            parts.join(F.broadcast(cents_df), "_sid")
            .withColumn("_d2", d2)
            .groupBy("_vid", "_sid")
            .agg(F.min(F.struct("_d2", "_cid", "_sv")).alias("_m"))
            .select(
                "_vid",
                "_sid",
                F.col("_m._sv").alias("_sv"),
                F.col("_m._cid").alias("_cid"),
                F.col("_m._d2").alias("_d2"),
            )
        )

    for _ in range(iters):
        assigned = assign(cents)
        means = (
            assigned.select("_sid", "_cid", F.posexplode("_sv").alias("_pos", "_x"))
            .groupBy("_sid", "_cid", "_pos")
            .agg(
                (
                    F.sum(F.col("_x").cast("decimal(30,8)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("_mu")
            )
        )
        cents = means.groupBy("_sid", "_cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_mu"))),
                lambda s: s.getField("_mu"),
            ).alias("_cv")
        )

    # materialize the trained codebooks (m*k tiny rows) before handing
    # them out: every consumer references them at least twice (code
    # assignment AND the ADC distance table), and without the checkpoint
    # each reference re-runs the whole Lloyd training — the
    # re-derivation trap, at 2x the most expensive stage in the pipeline
    cents = cents.localCheckpoint(eager=True)
    codes = assign(cents).select("_vid", "_sid", "_cid", "_d2")
    return codes, cents


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    n_queries: int = 3,
    k_top: int = 10,
) -> DataFrame:
    """Asymmetric-distance-computation top-k over PQ codes — the
    memory-side scale path for ANN: the corpus is represented by ``m``
    small integer codes per vector (here 4 bytes vs 256 for the raw
    float64 vector), and a query scores a candidate by summing ``m``
    precomputed query-to-centroid subdistances instead of touching the
    raw vector.

    Plan shape: the distance table (query x subspace x code =
    ``n_queries * m * k`` rows) is built from the broadcast codebooks
    and itself broadcast into the code join, so scoring the full corpus
    is a map-side lookup plus ONE (query, candidate) aggregation whose
    partials combine map-side.  The per-pair partial subdistances are
    summed as DECIMAL(30,8) — exact and order-independent — so the
    ranking (and hence the top-k cut) is engine-deterministic and an
    unrolled SQL oracle reproduces the result hash-exactly; the double
    cast happens only in the output projection.

    At 100 TB the corpus side carries only (vid, sid, cid) — the raw
    embedding column is never read after encoding — and the aggregation
    shuffles on (query, candidate) with map-side combine; skew is
    bounded because every candidate contributes exactly ``m`` rows."""
    codes, cents = pq_codes(df, id_col, vec_col, dim, m=m, k=k, iters=iters)
    sub = dim // m
    # queries need vectors too: the encode gate must apply to the query
    # slice or a NULL query scores every candidate NULL and wins the
    # NULLS FIRST ranking (embeddings NULL-probe finding)
    qvecs = df.where(
        (F.col(id_col) < n_queries) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    qparts = _pq_subspaces(qvecs, m, sub).select(
        F.col("_vid").alias("_qid"), "_sid", F.col("_sv").alias("_qv")
    )
    qd2 = F.aggregate(
        F.zip_with("_qv", "_cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dtab = (
        qparts.join(F.broadcast(cents), "_sid")
        .select(
            "_qid",
            "_sid",
            "_cid",
            qd2.cast("decimal(30,8)").alias("_pd2"),
        )
    )
    scored = (
        codes.join(F.broadcast(dtab), ["_sid", "_cid"])
        .where(F.col("_qid") != F.col("_vid"))
        .groupBy("_qid", "_vid")
        .agg(F.sum("_pd2").alias("_sum"))
    )
    w = Window.partitionBy("_qid").orderBy("_sum", "_vid")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k_top)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_vid").alias("candidate_id"),
            F.round(F.col("_sum").cast("double"), 6).alias("approx_d2"),
            "rank",
        )
    )


def pq_refine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    n_queries: int = 3,
    k_shortlist: int = 50,
    k_top: int = 10,
) -> DataFrame:
    """ADC shortlist + EXACT re-rank — the standard two-stage PQ search
    (shortlist with compressed codes, refine with raw vectors): take the
    top ``k_shortlist`` candidates per query by asymmetric PQ distance,
    fetch ONLY those candidates' raw vectors, re-rank by exact squared
    distance, and return the top ``k_top``.  This is how PQ is actually
    deployed: the approximation decides what to READ (a ``k_shortlist``
    /corpus fraction of the embedding column), the exact math decides
    what to RETURN, and ADC ranking error beyond the shortlist boundary
    is the only recall loss.

    Scale shape: stage 1 is ``pq_adc_topk`` (codes-only, broadcast
    distance tables); stage 2 joins ``n_queries * k_shortlist``
    candidate ids — a broadcast semi-join against the vector table, so
    the raw embedding column is read for the shortlist only, never
    scanned per query.  The exact d2 is the same left-fold double the
    brute-force baseline uses, so the refine stage replays bit-exactly
    in the unrolled SQL oracle (ranking on raw fold doubles, the
    ``similarity_topk`` precedent)."""
    shortlist = pq_adc_topk(
        df, id_col, vec_col, dim, m=m, k=k, iters=iters,
        n_queries=n_queries, k_top=k_shortlist,
    ).select(
        F.col("query_id").alias("_qid"), F.col("candidate_id").alias("_vid")
    )
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    qvecs = df.where(
        (F.col(id_col) < n_queries) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_qid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    # the shortlist (n_queries * k_shortlist ids) broadcasts into the
    # vector scan — the corpus-sized side never shuffles
    paired = (
        F.broadcast(shortlist).join(vecs, "_vid")
        .join(F.broadcast(qvecs), "_qid")
    )
    d2 = F.aggregate(
        F.zip_with("_qv", "_cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("_qid").orderBy("_d2", "_vid")
    return (
        paired.withColumn("_d2", d2)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k_top)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_vid").alias("candidate_id"),
            F.round("_d2", 6).alias("exact_d2"),
            "rank",
        )
    )


def ivf_pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_lists: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    n_queries: int = 3,
    k_top: int = 10,
) -> DataFrame:
    """IVF + PQ composite search — the production ANN deployment shape
    (FAISS ``IVFPQ``): a coarse k-means quantizer partitions the corpus
    into ``n_lists`` inverted lists, each query probes only its
    ``nprobe`` nearest lists, and the candidates inside those lists are
    scored by asymmetric PQ distance (codes only).  The two independent
    cost reducers compose: IVF bounds WHICH vectors are scored
    (``nprobe / n_lists`` of the corpus), PQ bounds WHAT is read per
    scored vector (``m`` small integer codes, never the raw embedding).

    Both trainings follow the repo's engine-exact Lloyd spec (first-k
    -by-id seeding, left-fold d2, DECIMAL(30,8) means, (d2, id) argmin
    tie-breaks), the probe ranks by the same exact fold, and ADC
    partials sum as DECIMAL(30,8) — so the whole composite replays
    hash-exactly in an unrolled SQL oracle, top-k cut included.

    Scale shape: coarse centroids and PQ codebooks are tiny broadcast
    frames (``n_lists`` and ``m*k`` rows; each is localCheckpoint-ed
    once so its double reference costs one training, the pq_codes
    discipline); the corpus-sized frames (assignment, codes) meet the
    broadcast probe/distance tables in map-side joins; the only
    corpus-sized shuffle is the (query, candidate) partial-sum
    aggregation, map-side combinable, and IVF has already cut its input
    by ``nprobe / n_lists``.  Nothing data-sized crosses to the
    driver."""
    from logistream_data_pipeline_aws_spark.operators.similarity import (
        _gated_vecs,
        _literal_argmin_max_k,
        _lloyd_train,
        _lloyd_train_literal,
        _nearest,
        _nearest_literal,
        _sql_d2,
    )

    vecs = _gated_vecs(df, id_col, vec_col)
    if n_lists <= _literal_argmin_max_k(df.sparkSession):
        # gate-bounded coarse quantizer (r15): literal Lloyd training +
        # in-row assign, and the query probe becomes an in-row
        # sort-and-slice over the literal centroid structs —
        # array_sort's lexicographic (d2, cid) ascending order IS the
        # row_number window's orderBy(_d2, _cid), so the nprobe cut is
        # identical.  No localCheckpoint needed: the centroids are
        # driver values, so the double reference costs nothing.
        seed_rows = [
            (int(r["_vid"]), [float(x) for x in r["_v"]])
            for r in vecs.where(F.col("_vid") < n_lists).collect()
        ]
        coarse_rows = _lloyd_train_literal(vecs, seed_rows, iters)
        asg = _nearest_literal(vecs, coarse_rows).select(
            "_vid", F.col("_cid").alias("_list")
        )
        if not coarse_rows:  # empty/all-NULL corpus: no lists to probe
            probe = vecs.select(
                F.col("_vid").alias("_qid"),
                F.lit(None).cast("int").alias("_list"),
            ).where(F.lit(False))
        else:
            sorted_cents = F.expr(
                "array_sort(array("
                + ",".join(
                    "named_struct('_d2', "
                    + _sql_d2("_v", c)
                    + ", '_cid', CAST("
                    + str(int(cid))
                    + " AS INT))"
                    for cid, c in coarse_rows
                )
                + "))"
            )
            probe = (
                vecs.where(F.col("_vid") < n_queries)
                .select(
                    F.col("_vid").alias("_qid"),
                    F.explode(F.slice(sorted_cents, 1, nprobe)).alias("_e"),
                )
                .select("_qid", F.col("_e._cid").alias("_list"))
            )
    else:
        seeds = vecs.where(F.col("_vid") < n_lists).select(
            F.col("_vid").cast("int").alias("_cid"), F.col("_v").alias("_c")
        )
        # n_lists tiny rows referenced twice (corpus assignment + query
        # probe): checkpoint so the coarse training runs once
        coarse = _lloyd_train(vecs, seeds, iters).localCheckpoint(eager=True)
        asg = _nearest(vecs, coarse).select(
            "_vid", F.col("_cid").alias("_list")
        )
        d2 = F.aggregate(
            F.zip_with("_v", "_c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        wq = Window.partitionBy("_qid").orderBy("_d2", "_cid")
        probe = (
            vecs.where(F.col("_vid") < n_queries)
            .select(F.col("_vid").alias("_qid"), "_v")
            .crossJoin(F.broadcast(coarse))
            .withColumn("_d2", d2)
            .withColumn("_rn", F.row_number().over(wq))
            .where(F.col("_rn") <= nprobe)
            .select("_qid", F.col("_cid").alias("_list"))
        )
    codes, cents = pq_codes(df, id_col, vec_col, dim, m=m, k=k, iters=iters)
    sub = dim // m
    qraw = df.where(
        (F.col(id_col) < n_queries) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    qparts = _pq_subspaces(qraw, m, sub).select(
        F.col("_vid").alias("_qid"), "_sid", F.col("_sv").alias("_qv")
    )
    qd2 = F.aggregate(
        F.zip_with("_qv", "_cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dtab = qparts.join(F.broadcast(cents), "_sid").select(
        "_qid", "_sid", "_cid", qd2.cast("decimal(30,8)").alias("_pd2")
    )
    # IVF restriction: (query, candidate) pairs limited to probed lists
    # — n_queries * nprobe probe rows broadcast into the assignment
    cand = asg.join(F.broadcast(probe), "_list").select("_qid", "_vid")
    scored = (
        codes.join(cand, "_vid")
        .join(F.broadcast(dtab), ["_qid", "_sid", "_cid"])
        .where(F.col("_qid") != F.col("_vid"))
        .groupBy("_qid", "_vid")
        .agg(F.sum("_pd2").alias("_sum"))
    )
    w = Window.partitionBy("_qid").orderBy("_sum", "_vid")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k_top)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_vid").alias("candidate_id"),
            F.round(F.col("_sum").cast("double"), 6).alias("approx_d2"),
            "rank",
        )
    )
