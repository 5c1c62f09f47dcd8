"""S3 extract bridge: map the reference's ``config.json`` s3 section
onto Hadoop S3A configuration so ``spark.read`` pulls objects
directly.

The reference downloads each object driver-side with boto3 credentials
from config.json (tabjolt_email.py:17-31, manifest :351-356) and then
bulk-loads the local file. Spark's native answer is to skip the
download: point the distributed reader at ``s3a://bucket/key`` and let
every executor range-read its own split — no driver staging, no local
disk, and predicate/column pruning still applies. What remains of the
reference's extract step is exactly this credential/config bridge.

Config keys consumed (reference config.json:14-23 shape):

    bucket_name, folder_path, aws_access_key_id,
    aws_secret_access_key, region_name

No AWS SDK is required here — the keys become ``fs.s3a.*`` settings on
the session's Hadoop configuration, which is what the S3A connector
reads. Paths that are not s3 URIs pass through untouched, so the same
manifest code runs against local fixture files in tests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: config.json s3 section → fs.s3a.* setting.
_S3A_KEYS = {
    "aws_access_key_id": "fs.s3a.access.key",
    "aws_secret_access_key": "fs.s3a.secret.key",
    "region_name": "fs.s3a.endpoint.region",
}


def configure_s3a(spark: SparkSession, s3_config: dict) -> dict[str, str]:
    """Apply the reference-shaped s3 config to this session's Hadoop
    configuration (runtime-settable — no session restart needed).
    Returns the applied fs.s3a.* mapping for logging/tests."""
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    applied: dict[str, str] = {}
    for cfg_key, s3a_key in _S3A_KEYS.items():
        value = s3_config.get(cfg_key)
        if value:
            hadoop_conf.set(s3a_key, str(value))
            applied[s3a_key] = str(value)
    # optional endpoint override (minio/localstack-style testing)
    if s3_config.get("endpoint_url"):
        hadoop_conf.set("fs.s3a.endpoint", str(s3_config["endpoint_url"]))
        applied["fs.s3a.endpoint"] = str(s3_config["endpoint_url"])
    return applied


def s3a_uri(s3_config: dict, key: str) -> str:
    """``s3a://bucket/folder/key`` from the config's bucket/folder —
    the URI equivalent of the reference's ``full_s3_key``
    (tabjolt_email.py:25)."""
    bucket = s3_config["bucket_name"]
    folder = (s3_config.get("folder_path") or "").strip("/")
    prefix = f"{folder}/" if folder else ""
    return f"s3a://{bucket}/{prefix}{key.lstrip('/')}"


def resolve_extract_path(path: str, s3_config: dict | None) -> str:
    """Manifest paths stay local unless an s3 config is provided and
    the path is a bare *relative* object key — then it resolves to an
    s3a URI (the reference manifests keys like ``summary_line.csv``).
    Absolute paths and already-schemed URIs (s3a://, file://, hdfs://)
    pass through untouched, so the same manifest code runs against
    local fixtures."""
    if "://" in path or path.startswith("/") or s3_config is None:
        return path
    return s3a_uri(s3_config, path)
