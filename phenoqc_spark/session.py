"""SparkSession factory tuned for the KG-construction workload.

Defaults encode the scale posture (SURVEY.md §4.2): AQE on (skew-join
splitting + post-shuffle coalescing), Arrow transport for every pandas UDF,
bounded Arrow batch sizes so the linking UDF's per-batch dictionary scoring
stays cache-friendly, and a shuffle-partition count that callers override
per data scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # InferFiltersFromGenerate injects a `size(arr) > 0` filter below every
    # explode and pushes it toward the scan.  When the exploded array is a
    # COMPUTED expression (shingle sets, gram/fingerprint arrays, band
    # structs — most generators in this engine), the pushed filter
    # re-derives the entire array expression per input row, interpreted,
    # with nested-lambda re-evaluation — measured 48.4 s → 0.27 s on the
    # winnowing fingerprint stage (sf0.01, 500 docs) with the rule
    # excluded.  The rule is results-neutral (explode of an empty array
    # already emits nothing); excluding it trades a row-skip micro-win for
    # plans whose generator input is a cheap column against a catastrophic
    # recompute for computed arrays, at any cluster scale.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "20000",
    "spark.sql.session.timeZone": "UTC",
    # keep stdout machine-parseable (bench.py prints ONE JSON line; the
    # console progress bar writes \r-mangled frames around it otherwise)
    "spark.ui.showConsoleProgress": "false",
    # At 100 TB these become cluster-level settings; local defaults keep
    # partitions executor-memory-sized on local[32].
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "phenoqc-spark",
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    conf = dict(DEFAULT_CONF)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
