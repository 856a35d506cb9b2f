"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
joukejensma/udacity-data-engineering-capstone-project (see SURVEY.md):
ETL operators, star-schema construction, data-quality checks, and analysis
queries — extended with large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design principles (100 TB north star):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Built-in `pyspark.sql.functions` in hot paths (whole-stage codegen);
  Arrow-batched pandas UDFs only where built-ins can't express semantics.
- Broadcast small dims, minimize shuffles, push filters/projections to scans.
"""

from udacity_data_engineering_capstone_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
