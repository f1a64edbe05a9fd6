from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.catalog.datatypes import (
    DataType,
    deduce_data_type,
    max_data_type,
    deduce_data_types,
)

__all__ = [
    "Granularity",
    "DataType",
    "deduce_data_type",
    "max_data_type",
    "deduce_data_types",
]
