"""Read/write helpers replacing the reference's S1-S8 edge operators
(SURVEY §2.1).

- Catalog CSV scans (GE:100-103, GE:204-207) -> schema'd ``read_csv`` /
  ``read_parquet`` (parquet is the engine's native staging format: columnar,
  predicate pushdown + column pruning for free — the single biggest
  physical upgrade over the reference's CSV staging, SURVEY §4.2).
- TRUNCATE-then-append soft overwrite (GE:46-59 + GE:71-85) ->
  ``write_table(mode="overwrite")``; batching/bucketed JDBC loads ->
  ``functions.keys.write_bucketed``.
- Lambda S3 JSON get/put (LJ:17-24) -> ``read_json(multiline=True)`` and
  ``write_table(fmt="csv", header=True)``.

Paths are plain Hadoop-FS URIs: ``file:/...`` locally, ``s3a://...`` on a
cluster — same code either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with an explicit schema — the engine never infers
    (SURVEY §1.3); crawler-style inference is a CLI concern, not an
    engine one."""
    return spark.read.options(header=str(header).lower(), **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = True,
) -> DataFrame:
    r = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Sink with overwrite ≡ the reference's TRUNCATE+append (GE:113 etc.).

    ``partition_by`` yields hive-style directory partitioning so downstream
    scans get partition pruning — the scale story for date-keyed facts.
    """
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def stage_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key.

    This is the 100 TB answer to the engine's one big-big join
    (lineitem ⋈ orders on the order key): two tables bucketed identically
    on the key join with NO exchange — the shuffle is paid once at
    staging time and amortized over every subsequent join.  The reference
    approximated this with manual pmod bucket loops at load time
    (GE:150-162, GE:352-362); Spark's bucketed tables are the declarative
    form.  ``sortBy`` keeps bucket files internally sorted (better
    min/max pruning; and per-join sort elision under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` — off by
    default in Spark 3+, so plans still show a cheap local Sort).
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if not spark.catalog.tableExists(table_name):
        # a previous session (in-memory catalog) may have left the managed
        # location on disk with no catalog entry; overwrite cannot claim it
        # (LOCATION_ALREADY_EXISTS), so clear the orphan first — via the
        # Hadoop FS API, so any warehouse filesystem works
        wh = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(wh, table_name.lower())
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)

    # pre-shuffle onto the bucket key: exactly ONE file per bucket.
    # Without this, every write task emits a file per bucket (small-files
    # explosion at scale) and Spark only trusts sortBy order for
    # single-file buckets — multi-file buckets re-insert a per-join Sort.
    staged = df.repartition(n_buckets, F.col(bucket_key))
    w = staged.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def write_if_nonempty(df: DataFrame, path: str, **kwargs) -> bool:
    """Empty-input write guard (SURVEY §2.2 P5, GE:72-74): skip the sink
    when there are no rows.  ``isEmpty`` evaluates a 1-row limit, not a
    full count."""
    if df.isEmpty():
        return False
    write_table(df, path, **kwargs)
    return True


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a fragmented table directory into
    ceil(total_bytes / target) files and return the new file count.

    Streaming sinks and highly parallel writers leave thousands of tiny
    files per partition; at warehouse scale every downstream scan then
    pays per-file open/footer costs and the driver pays listing costs —
    compaction to ~128 MB files is the standard maintenance pass.  Sizing
    comes from the filesystem (no data scan); the rewrite is one
    ``coalesce`` job (no shuffle — partition merge only) staged through a
    temp dir + atomic-as-possible swap so readers never see a half
    table."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))

    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compacting")
    df = getattr(spark.read, fmt)(path)
    getattr(df.coalesce(n_files).write.mode("overwrite"), fmt)(tmp.toString())
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._old")
    fs.rename(p, old)
    fs.rename(tmp, p)
    fs.delete(old, True)
    return n_files


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Per-partition small-file compaction for a hive-partitioned table
    (VERDICT r4 next-round #5): every LEAF ``col=value`` directory is
    rewritten in place via ``compact_table`` — partition values live in
    the directory names, not the files, so the rewrite preserves the
    layout, downstream partition pruning, and the readback byte-for-byte.

    This is the maintenance pass the grow-only writers need: the
    ``partitionBy(order_month)`` fact gains files on every incremental
    append, and the streaming MERGE upsert rewrites whole buckets per
    commit — both the streaming analogs of the reference's 20-bucket
    sequential loads (GE:352-362), which fragment the same way at toy
    scale.  Each partition is an independent coalesce job + swap
    (parallelizable across a maintenance fleet; here sequential), and a
    partition already at its target count is skipped without a rewrite.

    Returns {relative_partition_dir: file_count_after} for the rewritten
    partitions."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)

    def leaves(p):
        subs = [
            s.getPath()
            for s in fs.listStatus(p)
            if s.isDirectory() and "=" in s.getPath().getName()
        ]
        if not subs:
            yield p
            return
        for s in subs:
            yield from leaves(s)

    # qualify so root and listStatus children share the same URI scheme
    root = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(path))
    results: dict[str, int] = {}
    for leaf in leaves(root):
        if leaf.toString() == root.toString():
            continue  # unpartitioned table: use compact_table directly
        n_before = sum(
            1
            for s in fs.listStatus(leaf)
            if s.isFile() and s.getPath().getName().endswith("." + fmt)
        )
        total = fs.getContentSummary(leaf).getLength()
        n_target = max(1, -(-int(total) // int(target_file_bytes)))
        if n_before <= n_target:
            continue
        rel = leaf.toString()[len(root.toString()) :].lstrip("/")
        results[rel] = compact_table(
            spark, leaf.toString(), target_file_bytes=target_file_bytes, fmt=fmt
        )
    return results
