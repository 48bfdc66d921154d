"""SparkSession builder tuned for the engine.

Replaces the reference's session bootstrap (``etl_jobs/glue_master_etl.py``
GE:25-29: SparkContext -> GlueContext -> spark_session + a py4j JDBC handle)
with a plain SparkSession plus the configs that matter at scale:

- AQE on (runtime coalescing of post-shuffle partitions, skew-join split).
- Broadcast threshold generous enough that every dimension-side join in the
  fact key pipeline (SURVEY §2.3 J1-J7) broadcasts instead of shuffling.
- ``spark.sql.shuffle.partitions`` sized for the local test harness; on a
  real cluster AQE's coalescing makes the static number mostly moot.
- Arrow enabled for the few pandas-interop paths (similarity fallbacks).

No Glue/AWS service calls: the catalog role is played by
``logistream_data_pipeline_aws_spark.catalog``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "logistream-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so tests/bench and a real cluster share one entry point: on a cluster,
    pass ``master=None`` with a pre-set spark.master and everything else
    still applies.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- Catalyst/AQE: let the optimizer re-plan at runtime -------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first post-shuffle coalescing KEPT at Spark's
        # default (r15 NEGATIVE RESULT, guide §2.2 vs measured evidence):
        # byte-based coalescing (parallelismFirst=false, the documented
        # busy-cluster recommendation) was hypothesized to fix the
        # sub-second tail whose 8-core bench beats 32-core, but an
        # interleaved same-session A/B at sf0.1 showed NO reproducible
        # win anywhere and strong losses wherever a post-shuffle stage is
        # CPU-dense with a small byte footprint — the coalesce-to-one-
        # partition serialized window sorts over token/edge frames
        # (graph_kcore 9.5->13.6 s, doc_substring_spans 1.56->2.62,
        # dedup_prefix_filter 1.75->2.48, user_sessions 0.39->0.56).
        # Scheduling 32 tiny tasks is not this workload's bottleneck;
        # fixed per-query planning cost is (OPTIMIZATION_r15.md).  The
        # env knob keeps the A/B reproducible.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- joins: dims are small, always prefer broadcast-hash ------------
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- shuffle sizing --------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # -- python interop: Arrow batches, never row-at-a-time pickling -----
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- keep timestamps deterministic across engines --------------------
        .config("spark.sql.session.timeZone", "UTC")
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # -- heap: local mode shares ONE JVM between driver and executors;
        # Spark's 1g default OOMs a long session (the 120-query plan audit
        # dies at ~114 with persisted staged frames).  Effective only at
        # JVM launch — the first getOrCreate in the process.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
