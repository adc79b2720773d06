"""Import every query module so the registry is fully populated."""

from datapipeline_dags_spark.plans import (  # noqa: F401
    advanced,
    event_time,
    llm_ops,
    mining,
    modeling,
    multimodal_queries,
    relational,
    scalars,
)
from datapipeline_dags_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
