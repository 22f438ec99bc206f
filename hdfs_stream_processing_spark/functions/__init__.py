"""Scalar function helpers (SURVEY §2.8)."""

from hdfs_stream_processing_spark.functions.wire import parse_wire, to_wire  # noqa: F401
from hdfs_stream_processing_spark.functions.detmath import (  # noqa: F401
    money_avg,
    money_sum,
)
from hdfs_stream_processing_spark.functions.timefn import (  # noqa: F401
    epoch_to_ts,
    ts_to_string,
)
