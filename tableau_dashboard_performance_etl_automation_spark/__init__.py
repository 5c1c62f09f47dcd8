"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline
(shivamks2001/Tableau-Dashboard-Performance-ETL-Automation).

The reference (``tabjolt_email.py``) delegates all relational work to
Vertica; this package re-expresses that capability surface — delimited
ingestion with reject capture, the nine analytic queries, and report
sinks — as idiomatic Spark DataFrame plans, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.
"""

from tableau_dashboard_performance_etl_automation_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
