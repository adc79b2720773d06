"""Import every query module so the registry is fully populated."""

from datapipeline_dags_spark.plans import relational, scalars  # noqa: F401
from datapipeline_dags_spark.plans.registry import ORACLES, QUERIES

try:  # extension operators (SURVEY §2.11) — registered as they land
    from datapipeline_dags_spark.plans import llm_ops  # noqa: F401
except ImportError:
    pass

__all__ = ["QUERIES", "ORACLES"]
