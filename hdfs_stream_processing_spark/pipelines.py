"""Reference-equivalent end-to-end pipelines (SURVEY §7 step 4).

``align_rooms`` re-creates the reference's entire batch transform
(/root/reference/utils/spark_transforming.py:60-165) Spark-first:

  reference                                   here
  ---------                                   ----
  255 per-file CSV reads in a Python loop     narrow frames (one plan each)
  4-way SQL join per room over temp views     multi_join on the ts key
  reduce-union of 51 room frames              union_by_name
  global sort before write                    orderBy (kept for parity;
                                              see sort_by docstring for
                                              the partitioned alternative)
  dropna                                      drop_nulls
  from_unixtime + date_format                 epoch_to_ts / ts_to_string
  CASE WHEN pir > ...                         case_when (classify stage
                                              shared with streaming)

The whole pipeline is ONE Catalyst plan: narrow-frame construction, the
alignment joins, union, and classification all fuse into whole-stage
codegen with the dims broadcast — no per-room driver loop, no temp
views, no 255 scan jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.functions.timefn import epoch_to_ts
from hdfs_stream_processing_spark.operators.relational import (
    add_lit,
    case_when,
    drop_nulls,
    sort_by,
    union_by_name,
)
from hdfs_stream_processing_spark.schemas import SENSOR_METRICS

#: epoch base for the derived event_ts_min column (arbitrary, fixed).
EPOCH_BASE = 1_700_000_000


def narrow_sensor_frames(
    room_df: DataFrame, key_col: str, value_col: str
) -> list[DataFrame]:
    """Synthesize the 5 per-sensor narrow tables (ts, metric) from one
    wide source — the shape the reference reads from 5 CSVs per room
    (spark_transforming.py:66-86).  Metric i scales the value by (i+1)
    so each 'sensor' is distinct but deterministic."""
    return [
        room_df.select(
            F.col(key_col).alias("ts_min_bignt"),
            (F.col(value_col) * F.lit(float(i + 1))).alias(metric),
        )
        for i, metric in enumerate(SENSOR_METRICS)
    ]


def align_room(narrow: list[DataFrame], room: str) -> DataFrame:
    """The core reference semantic: align N co-keyed narrow streams with
    chained inner equi-joins on the timestamp key
    (spark_transforming.py:97-113), then tag the room (:114)."""
    acc = narrow[0]
    for right in narrow[1:]:
        acc = acc.join(right, on="ts_min_bignt", how="inner")
    return add_lit(acc, "room", room)


def align_rooms(
    events: DataFrame,
    n_rooms: int = 2,
    movement_threshold: float = 250.0,
) -> DataFrame:
    """Full reference batch pipeline on the driver's events table.

    Rooms partition the input by ``user_id % n_rooms``; each room's 5
    synthesized sensor streams are aligned on event_id, rooms are
    unioned, nulls dropped, the result sorted, the display timestamp
    derived (spark_transforming.py:139-149), and the movement CASE from
    the streaming consumers applied (convert-to-elasticsearch.py:120-134).
    """
    rooms = []
    for r in range(n_rooms):
        room_src = events.where(F.col("user_id") % n_rooms == r)
        narrow = narrow_sensor_frames(room_src, "event_id", "value")
        rooms.append(align_room(narrow, f"room_{r}"))
    unioned = union_by_name(rooms)
    cleaned = drop_nulls(unioned)
    ordered = sort_by(cleaned, ["ts_min_bignt"])
    with_ts = ordered.withColumn(
        "event_ts_min", epoch_to_ts(F.lit(EPOCH_BASE) + F.col("ts_min_bignt"))
    )
    return case_when(
        with_ts,
        "if_movement",
        [(F.col("pir") > movement_threshold, "movement")],
        "no_movement",
    )
