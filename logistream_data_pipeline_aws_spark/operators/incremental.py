"""Incremental (asymmetric) corpus ingest dedup: a NEW shard checked
against the EXISTING corpus without re-mining the corpus against itself.

``dedup_family`` covers the self-join forms (full-corpus pair mining,
clustering, survivor selection).  The day-2 problem of a training-data
pipeline is different: yesterday's corpus is already deduplicated and its
minhash signatures are a materialized staging table; today's shard must
be admitted or rejected by joining against that table — candidate cost
proportional to |shard| x bucket density, never |corpus|².  This module
is the banded-LSH formulation of that asymmetric join.

Scale shape at 100 TB: the corpus side's band keys are precomputed (the
signature staging table ``dedup_family.minhash_near_duplicates``
prescribes), the cap discipline is one map-side-combinable count over
the CORPUS side only (hot template buckets are a corpus property, and
observable via the same dropped-bucket metric as the self-join family),
and the verify join touches exactly the candidate pairs.  Nothing scales
with |corpus| except the one equi-join probe on md5-uniform band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKET_SIZE = 1024


def _banded(sig_df: DataFrame, id_alias: str, n_hashes: int, bands: int) -> DataFrame:
    """Explode a ``minhash_signatures`` frame into (id, band_hash) rows —
    the band layout ('<j>#' + '_'-joined signature slice) matches
    ``dedup_family.lsh_candidate_pairs`` exactly, so the two forms mine
    identical buckets and a staged corpus banding serves both."""
    if n_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes}): trailing "
            "signature positions would be silently excluded from banding"
        )
    r = n_hashes // bands
    band_hashes = F.array(
        *[
            F.concat(F.lit(f"{j}#"), F.concat_ws("_", F.slice("sig", j * r + 1, r)))
            for j in range(bands)
        ]
    )
    return sig_df.select(
        F.col("doc_id").alias(id_alias), F.explode(band_hashes).alias("band_hash")
    )


def incremental_near_duplicates(
    incoming_sigs: DataFrame,
    corpus_sigs: DataFrame,
    n_hashes: int,
    bands: int,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Verified asymmetric near-dup pairs: (in_id, corp_id, jaccard) for
    every incoming doc sharing an LSH band bucket with a corpus doc AND
    passing exact shingle-Jaccard >= threshold (no false positives —
    banding only generates candidates).

    The bucket cap applies to the CORPUS side: a band key held by more
    than ``max_bucket_size`` corpus docs is a boilerplate mass whose
    membership belongs to exact dedup, and joining a shard row against
    it would expand quadratically.  Dropped buckets are observable via
    the ``incremental_bucket_cap`` metric (same discipline as
    ``capped_bucket_pairs``).  Unlike the self-join form the floor is 1,
    not 2 — a single-member corpus bucket still matches incoming rows.
    """
    bin_ = _banded(incoming_sigs, "in_id", n_hashes, bands)
    bcorp = _banded(corpus_sigs, "corp_id", n_hashes, bands)
    if max_bucket_size is not None:
        counts = bcorp.groupBy("band_hash").agg(
            F.countDistinct("corp_id").alias("_n_ids")
        )
        counts = counts.observe(
            "incremental_bucket_cap",
            F.sum((F.col("_n_ids") > max_bucket_size).cast("long")).alias(
                "dropped_buckets"
            ),
            F.sum(
                F.when(F.col("_n_ids") > max_bucket_size, F.col("_n_ids"))
                .otherwise(0)
                .cast("long")
            ).alias("dropped_docs"),
        )
        keep = counts.where(F.col("_n_ids") <= max_bucket_size).select("band_hash")
        # the band-key vocabulary scales with the corpus: never a broadcast
        # build side (static size estimates for aggregates are unreliable —
        # the 100x probe's broadcast-misestimate OOM class); sort-merge
        # keeps the keep-set join co-partitioned with the bucket probe
        bcorp = bcorp.join(keep.hint("merge"), "band_hash")
    cand = bin_.join(bcorp, "band_hash").select("in_id", "corp_id").distinct()
    a = incoming_sigs.select(
        F.col("doc_id").alias("in_id"), F.col("shingles").alias("_sh_a")
    )
    b = corpus_sigs.select(
        F.col("doc_id").alias("corp_id"), F.col("shingles").alias("_sh_b")
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    jac = F.round(inter / union, 6)
    return (
        cand.join(a, "in_id")
        .join(b, "corp_id")
        .select("in_id", "corp_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
