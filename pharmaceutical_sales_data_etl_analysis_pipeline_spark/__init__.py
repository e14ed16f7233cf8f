"""PySpark-native analytics engine with the query & data-processing
capabilities of chatterjeepr/Pharmaceutical-Sales-Data-ETL-Analysis-Pipeline.

Brand-new, Spark-first implementation (DataFrame / Spark SQL / Catalyst):
the reference is a single-process R+SQLite/MySQL ETL pipeline; this package
re-expresses its operator surface (SURVEY.md §2) declaratively so Catalyst
picks physical strategies (broadcast joins, partial aggregation, AQE), and
adds the LLM-data-pipeline operator set (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"
