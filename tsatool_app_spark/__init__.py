"""tsatool_app_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of webbidevaajat/tsatool-app.

The reference (studied at /root/reference, see SURVEY.md) analyzes boolean
conditions over road-weather sensor time series: raw observations are packed
into tri-state (true/false/unknown) validity time ranges, per-sensor ranges are
aligned on a common boundary segmentation and combined with Kleene logic, and
per-condition valid/notvalid/nodata durations are rolled up.

This package re-expresses those semantics Spark-first: DataFrame window
functions for range packing, a shuffle-free boundary-alignment plan instead of
interval joins, Catalyst-optimized joins/aggregations, and Structured Streaming
for live ingestion — plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for 100 TB.
"""

__version__ = "0.1.0"
