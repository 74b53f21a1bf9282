"""tms_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (``devtiagoabreu/tms-etl``,
surveyed in ``SURVEY.md``): partitioned CSV/Parquet sources, the
71-column shift-grain fact schema, quality predicates, join-based
upsert (MERGE) with first-write-wins semantics for powered-off shifts,
a full relational operator surface (joins incl. as-of/range, window
functions, grouping sets, set ops, top-k), a streaming layer, and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Everything is expressed declaratively through the DataFrame/SQL API so
Catalyst can push filters, prune columns/partitions, and pick join
strategies; Python UDFs appear only where built-ins genuinely cannot
express the semantics (and then as Arrow-batched pandas UDFs).
"""

from tms_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
