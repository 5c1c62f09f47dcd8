"""JSONL bulk load with reject capture — the training-data-pipeline
counterpart of ``sources/delimited.py``: LLM corpora ship as
newline-delimited JSON (one document object per line), and an
ingest-at-scale loader must divert malformed lines (truncated writes,
encoding damage, schema drift) without failing the job.

Same contract as the delimited loader (reference semantics at
tabjolt_email.py:33-56 — load good rows, spool bad rows, never abort):

- one PERMISSIVE ``spark.read.json`` scan with a corrupt-record
  column; good/rejected are two filters over the same cached scan
  (single distributed pass, no row visits the driver);
- ``good + rejected == input lines`` (row conservation);
- a line parses but misses required fields → also rejected (schema
  drift is a reject, not a NULL-riddled row in the corpus).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from tableau_dashboard_performance_etl_automation_spark.catalog import (
    ensure_engine_confs,
)
from tableau_dashboard_performance_etl_automation_spark.sources.delimited import (
    LoadResult,
)

_CORRUPT = "_corrupt_record"


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    required: tuple[str, ...] = (),
    reject_path: str | None = None,
) -> LoadResult:
    """Parse a JSONL file against a declared schema, diverting
    malformed lines instead of failing the load.

    A line is rejected when (a) it isn't valid JSON, (b) a declared
    field fails type coercion, or (c) any ``required`` field is
    missing/null — the checks a corpus loader runs before documents
    enter the pipeline. Rejected lines are preserved as raw text
    (re-parseable downstream, exactly like COPY's rejected-data
    spool)."""
    ensure_engine_confs(spark)
    read_schema = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad = F.col(_CORRUPT).isNotNull()
    for field in required:
        bad = bad | F.col(field).isNull()
    raw = raw.withColumn("_bad", bad).cache()
    good = raw.filter(~F.col("_bad")).drop(_CORRUPT, "_bad")
    # For a JSON-invalid line the corrupt column holds the raw text;
    # for a required-field reject re-serialize the parsed struct so
    # the reject sink is always one raw-text column.
    rejected = raw.filter(F.col("_bad")).select(
        F.coalesce(
            F.col(_CORRUPT),
            F.to_json(F.struct(*[f.name for f in schema.fields])),
        ).alias("rejected_row")
    )
    if reject_path is not None:
        rejected.write.mode("overwrite").text(reject_path)
    return LoadResult(good=good, rejected=rejected)
