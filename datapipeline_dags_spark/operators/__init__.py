"""Custom operators: multimodal media columns + Pandas-UDF stage lift."""

from datapipeline_dags_spark.operators.multimodal import (
    byte_histogram_features,
    decode_images,
    pandas_stage,
    read_binary_dir,
    sample_frames,
)

__all__ = [
    "read_binary_dir",
    "decode_images",
    "sample_frames",
    "byte_histogram_features",
    "pandas_stage",
]
