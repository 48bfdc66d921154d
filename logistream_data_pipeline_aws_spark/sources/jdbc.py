"""JDBC source/sink parity (SURVEY §2.1 S4/S5/S9).

The reference reads dims back from Redshift as subqueries (GE:61-69) and
appends with batchsize 10000 (GE:71-85), normalizing the JDBC URL by regex
(GE:32-44).  In this engine the warehouse is parquet + Spark SQL, so these
exist for *external* warehouse interop; there is no database in the test
container, so the URL/option logic is unit-tested and the read/write paths
are thin pass-throughs over ``spark.read.jdbc`` / ``df.write.jdbc``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

DEFAULT_OPTIONS = {
    # the reference's connection tuning (GE:43): ssl on, bounded timeouts
    "ssl": "true",
    "loginTimeout": "15",
    "socketTimeout": "60",
    "tcpKeepAlive": "true",
    # micro-batched writes (GE:82)
    "batchsize": "10000",
}


def normalize_jdbc_url(raw: str, default_db: str | None = None) -> str:
    """Normalize a JDBC URL: ensure a database path component and strip
    any query string (options are passed as properties instead, where
    they can't be shadowed by stray URL params)."""
    url = raw.split("?", 1)[0].rstrip("/")
    m = re.match(r"^(jdbc:[a-z0-9]+://[^/]+)(/.*)?$", url)
    if not m:
        raise ValueError(f"unrecognized JDBC URL: {raw!r}")
    host_part, path = m.group(1), m.group(2) or ""
    if not path and default_db:
        path = f"/{default_db}"
    return host_part + path


def read_subquery(
    spark: SparkSession, url: str, sql: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """Read ``(SELECT ...) t`` as a table — the reference's dim read-back
    shape (GE:61-69).  Push real predicates into ``sql``: the remote
    engine sees only this text."""
    props = {**DEFAULT_OPTIONS, **(properties or {})}
    return spark.read.jdbc(url, table=f"({sql}) t", properties=props)


def write_append(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    n_write_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC append; ``n_write_partitions`` bounds concurrent
    connections (the scalable form of the reference's sequential bucket
    loop, GE:150-162/GE:352-362: parallel partition writers instead of N
    jobs).  ``mode="overwrite"`` + truncate replaces TRUNCATE+append
    (GE:46-59)."""
    props = {**DEFAULT_OPTIONS, **(properties or {})}
    out = df.repartition(n_write_partitions) if n_write_partitions else df
    writer = out.write.mode(mode)
    if mode == "overwrite":
        writer = writer.option("truncate", "true")
    writer.jdbc(url, table, properties=props)
