from tsatool_app_spark.streaming.pack_ranges_stream import (
    streaming_dedup,
    streaming_sessionize,
    stream_observations,
    pack_ranges_stream,
    windowed_observation_counts,
)

__all__ = [
    "stream_observations",
    "pack_ranges_stream",
    "windowed_observation_counts",
    "streaming_dedup",
    "streaming_sessionize",
]
from tsatool_app_spark.streaming.condition_stream import streaming_condition_analysis

__all__.append("streaming_condition_analysis")

from tsatool_app_spark.streaming.incremental_stream import (
    fold_batch_into_snapshot,
    streaming_incremental_rollup,
)

__all__ += ["fold_batch_into_snapshot", "streaming_incremental_rollup"]

from tsatool_app_spark.streaming.distinct_stream import (
    fold_sketches_into_snapshot,
    read_distinct_estimates,
    streaming_distinct_counts,
)

__all__ += [
    "fold_sketches_into_snapshot",
    "read_distinct_estimates",
    "streaming_distinct_counts",
]

from tsatool_app_spark.streaming.join_stream import (
    attribute_purchases,
    click_purchase_pairs,
)

__all__ += ["click_purchase_pairs", "attribute_purchases"]

from tsatool_app_spark.streaming.snapshot_store import (
    publish_snapshot,
    read_snapshot,
)

__all__ += ["publish_snapshot", "read_snapshot"]

from tsatool_app_spark.streaming.cms_stream import (
    fold_cms_into_snapshot,
    read_cms_counts,
    streaming_cms_counts,
)

__all__ += ["fold_cms_into_snapshot", "read_cms_counts", "streaming_cms_counts"]
