"""PySpark-native analytics engine with the capabilities of
MobilizeNet/Example-DMS-DataExport.

The reference (/root/reference/control_migration_schema_script.sql) is a
metadata-driven CDC ingestion pipeline: discover AWS-DMS CSV exports in
object-store stages, plan full vs incremental loads per table, and apply
CDC change records (I/U/D) with latest-wins MERGE semantics.  This package
re-expresses that semantic layer Spark-first: the DataFrame API is the IR,
Catalyst is the optimizer, and the driver-side Python here is only the
control plane (metadata, file-watermark pruning, work scheduling).

Layout
------
session       SparkSession factory (AQE, UTC, shuffle-partition sizing)
metadata      DMS_METADATA model + parquet-backed store   (ref :20-37)
listing       stage file listing (LIST @stage analogue)   (ref :104,437)
discover      fill_dms_metadata: path parsing → metadata  (ref :431-481)
planner       prepare_migration_queue: B/I/F/N load plan  (ref :60-157)
full_load     TRUNCATE+COPY INTO → overwrite load         (ref :215-259)
merge         apply_changes full-outer CDC merge          (ref :369-408)
cdc           incremental_load: dedup + merge + watermark (ref :271-428)
runner        LOAD_TABLE task DAG → ThreadPool            (ref :163-203,494-552)
sources/      csv stage reader, JDBC source, warehouse sink
operators/    north-star: dedup, similarity search, text analysis, multimodal
functions/    deterministic hashing, vector math (builtins-first)
streaming/    Structured Streaming CDC (foreachBatch)
"""

__version__ = "0.1.0"
