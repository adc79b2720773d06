"""Extended-JSON file sink — SURVEY K1/K2 (S3/local JSON put).

The reference serializes batches with ``json_util.default`` and puts
one JSON object to S3 or the local filesystem
(parallelized_data_pipeline_dag.py:113-153).  The engine writes
**JSONL of extended-JSON records** from the executors — partitioned,
append-able, and splittable on re-read (the single-object form is an
unsplittable scale dead end; see sources/archive.py).  Any ``s3a://``
path works unchanged on a cluster with the S3 connector.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from datapipeline_dags_spark.functions.extended_json import to_extended_json


def write_extended_jsonl(
    df: DataFrame,
    target: StructType,
    path: str,
    *,
    entity: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write rows as extended-JSON lines.

    ``entity`` wraps each record as {"entity": ..., "record": {...}} —
    the tagged shape ``sources.archive.read_entity_jsonl`` reads back,
    so sink→source round trips are lossless including $date/$oid/
    $numberDecimal fidelity.
    """
    record = to_extended_json(F.struct(*[F.col(f.name) for f in target.fields]), target)
    if entity is not None:
        # splice the already-serialized record into the envelope (a
        # to_json(struct(...)) would re-escape it as a string value);
        # json.dumps(entity) so quotes/backslashes in the tag stay valid JSON
        line = F.concat(
            F.lit('{"entity": ' + json.dumps(entity) + ', "record": '),
            record,
            F.lit("}"),
        )
    else:
        line = record
    df.select(line.alias("value")).write.mode(mode).text(path)
