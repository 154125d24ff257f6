from tsatool_app_spark.dsl.errors import ErrorCollection
from tsatool_app_spark.dsl.idents import normalize_identifier, fold_umlauts
from tsatool_app_spark.dsl.block import BlockSpec
from tsatool_app_spark.dsl.condition import ConditionSpec

__all__ = [
    "ErrorCollection",
    "normalize_identifier",
    "fold_umlauts",
    "BlockSpec",
    "ConditionSpec",
]
