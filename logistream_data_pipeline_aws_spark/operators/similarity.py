"""Similarity search over embedding columns (array<float>).

Two paths with identical scoring (functions.vectors.cosine):

- ``brute_force_topk`` — exact: broadcast the (small) query set against
  the full corpus; per-query top-k via a partitioned window.  The corpus
  side streams — scales to any corpus size as long as the query set
  broadcasts.
- ``ann_topk`` — approximate: both sides bucketed by sign-pattern LSH
  (functions.vectors.sign_bucket); the join is an equi-join on the
  bucket id, so at scale it shuffles only on a uniform small key and
  each probe touches one bucket's partition instead of the full corpus.
  Recall < 1 by construction (single-probe); multi-probe = union over
  neighboring buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.functions.vectors import (
    cosine_with_norms,
    norm,
    sign_bucket,
)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


def center_embeddings_by_group(
    df: DataFrame, group_col: str, id_col: str, vec_col: str
) -> DataFrame:
    """Per-group mean-centering of embedding vectors via grouped
    ``applyInPandas`` — the third Arrow-batch shape (alongside
    ``mapInPandas`` in multimodal and ``applyInPandasWithState`` in
    streaming).  Needs whole-group context (the mean), which no
    per-row expression has; each group is one Arrow batch, shuffled by
    the group key — group size, not table size, bounds executor memory."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("centered", T.ArrayType(T.DoubleType())),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import decimal

        mat = np.stack(pdf[vec_col].map(np.asarray)).astype(float)
        # Deterministic cross-engine mean (the repo's decimal-sum contract,
        # plans.analytics): quantize each value to 8dp, sum EXACTLY in
        # decimal, divide in double — order-independent, so a SQL oracle
        # (SUM(CAST(x AS DECIMAL(30,8))) / n) reproduces it bit-for-bit.
        # Binary doubles never land on .5e-8 ties, so rounding mode is moot.
        q = decimal.Decimal("1e-8")
        n = mat.shape[0]
        means = np.array(
            [
                float(sum(decimal.Decimal(v).quantize(q) for v in mat[:, d].tolist())) / n
                for d in range(mat.shape[1])
            ]
        )
        centered = mat - means
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                "centered": list(map(list, centered.astype(float))),
            }
        )

    return (
        df.select(group_col, id_col, vec_col)
        .groupBy(group_col)
        .applyInPandas(center, schema=out_schema)
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Per-vector norms are computed BEFORE the cross join (once per vector,
    not once per pair) — bit-identical scores, 1/3 of the fold work."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_n"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_n"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(
                cosine_with_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return _topk(scored, k)


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_bits: int = 12,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's (flip each sign bit once) — the standard
    recall knob: the query side fans out ``n_bits + 1`` ways (queries are
    the SMALL side, so the explode is cheap) while the corpus stays
    bucketed exactly once, and the join remains a pure equi-join on the
    bucket id."""
    bucket = sign_bucket(F.col(vec_col), n_bits)
    if multiprobe:
        probes = F.array(
            bucket, *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_n"),
            F.explode(probes).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_n"),
            bucket.alias("bucket"),
        )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_n"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(
                cosine_with_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return _topk(scored, k)
