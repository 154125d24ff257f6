from tsatool_app_spark.operators.ranges import pack_ranges, pack_ranges_all_keys
from tsatool_app_spark.operators.combine import combine_blocks, boundary_segmentation
from tsatool_app_spark.operators.summary import validity_summary, observation_summary

__all__ = [
    "pack_ranges",
    "pack_ranges_all_keys",
    "combine_blocks",
    "boundary_segmentation",
    "validity_summary",
    "observation_summary",
]
