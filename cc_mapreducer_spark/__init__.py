"""cc_mapreducer_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
MapReduce pipeline (gustavo-bertoldi/CC-MapReducer, surveyed in SURVEY.md)
as idiomatic Spark DataFrame / SQL plans, plus the relational and
LLM-data-pipeline operator suite required for large-scale (100 TB-class)
training-data processing.

Layout:
    session     SparkSession factory tuned for the workload
    tables      parquet loaders for the driver's synthetic tables
    registry    central (query, oracle) registration used by __spark_entry__
    functions/  reusable Column expression helpers (pure built-ins)
    operators/  DataFrame -> DataFrame operators, each registered w/ oracle
    sources/    corpus / file-source helpers
    streaming/  Structured Streaming variants of the event operators
    plans/      plan-inspection utilities (explain capture, shuffle audit)
"""

from cc_mapreducer_spark.session import get_spark
from cc_mapreducer_spark.tables import TABLE_NAMES, load_table

__all__ = ["get_spark", "load_table", "TABLE_NAMES"]
