"""logistream_data_pipeline_aws_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference pipeline ``medhavipande18/logistream-data-pipeline-aws`` (AWS Glue
ETL + Lambda GeoJSON preprocessor + Redshift snowflake warehouse + BI
queries), re-expressed as idiomatic Spark: DataFrame / Spark SQL / Catalyst /
Structured Streaming.  The warehouse *is* the engine — Parquet-backed tables
+ Spark SQL views replace Redshift; surrogate keys are generated in-plan
instead of by ``IDENTITY(1,1)`` columns; the Lambda's Python loop becomes a
three-operator DataFrame pipeline.

Layout
------
- ``session``    SparkSession builder (AQE, broadcast, shuffle tuning)
- ``catalog``    logical table registry (name -> schema + path), view binding
- ``sources``    readers/writers: parquet/csv/json, GeoJSON flattener, jdbc
- ``functions``  scalar/column helpers: key normalization, date keys, WKT,
                 text analysis, vector math — all built on
                 ``pyspark.sql.functions`` (JVM-side; no row-at-a-time UDFs)
- ``operators``  dataflow operators: deterministic dedup, dimension builder,
                 fact key pipeline, dedup family (minhash-LSH/simhash/...),
                 similarity search, multimodal column plumbing
- ``plans``      end-to-end query plans: warehouse build, analytics A5-A8,
                 headline benchmark queries
- ``streaming``  Structured Streaming: windowed aggregation with watermarks,
                 stream-static joins, foreachBatch upsert

Design target: correctness verified at small scale factors, but every
operator chosen for 100 TB / 1000-executor behavior — broadcast the dim
side, shuffle only where semantics require, keep expressions inside
whole-stage codegen, never collect to the driver.
"""

__version__ = "0.1.0"
