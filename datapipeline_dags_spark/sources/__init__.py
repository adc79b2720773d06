"""Sources: archive/entity readers and mapping-config schema compilation."""

from datapipeline_dags_spark.sources.archive import (
    extract_archive,
    manifest_from_archive,
    read_entity,
    read_entity_jsonl,
)
from datapipeline_dags_spark.sources.mapping import (
    apply_mapping,
    projection,
    source_schema,
    target_schema,
)
from datapipeline_dags_spark.sources.messages import (
    parse_file_notifications,
    parse_verified_messages,
)

__all__ = [
    "extract_archive",
    "manifest_from_archive",
    "read_entity",
    "read_entity_jsonl",
    "apply_mapping",
    "projection",
    "source_schema",
    "target_schema",
    "parse_file_notifications",
    "parse_verified_messages",
]
