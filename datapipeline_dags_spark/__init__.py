"""datapipeline_dags_spark — a PySpark-native analytics & pipeline engine.

A from-scratch re-expression of the capabilities of the reference repo
``grohan2002/datapipeline-dags`` (Airflow DAGs orchestrating an opaque
``data_pipeline`` package; see SURVEY.md) as an idiomatic Apache Spark
engine:

- data plane   = DataFrame / Spark SQL / Catalyst / Structured Streaming
- control plane = a thin Python DAG scheduler (``pipeline.scheduler``)
- extensions    = LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.

Nothing in this package is translated from the reference's code; the
reference defines WHAT to compute (operator inventory in SURVEY.md §2),
and every HOW here is Spark-first.
"""

from datapipeline_dags_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
