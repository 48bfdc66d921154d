"""Vector math over ``array<float>`` embedding columns — pure
higher-order Catalyst expressions (zip_with / aggregate), no UDFs.

Determinism contract: products are computed element-wise in double
precision and summed with an explicit left fold from 0.0, which any
engine (Spark ``aggregate``, DuckDB ``list_reduce``) reproduces
bit-for-bit — so cosine scores hash-match across engines without
rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold double-precision dot product."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the per-vector norms supplied as columns.

    BIT-IDENTICAL to ``cosine`` when ``na``/``nb`` are ``norm(a)``/
    ``norm(b)`` — same expressions, same op order — but lets a join
    compute each norm once per VECTOR instead of once per PAIR, cutting
    the fold work of an all-candidates verify by ~3x."""
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def sign_bucket(a: Column, n_bits: int = 12) -> Column:
    """Coarse LSH bucket from the sign pattern of the first ``n_bits``
    dimensions: bucket = Σ (a[i] >= 0) << i.

    This is random-hyperplane LSH with axis-aligned planes — deterministic,
    engine-portable, and good enough to shard ANN probes; at scale, bucket
    is the shuffle/partition key so each probe touches one partition.
    """
    bit = lambda i: F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))  # noqa: E731
    out = bit(0)
    for i in range(1, n_bits):
        out = out + bit(i)
    return out.cast("long")
