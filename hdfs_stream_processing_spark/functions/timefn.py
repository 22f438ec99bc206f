"""Time functions (SURVEY F4/F5).

The reference derives a display timestamp with
``from_unixtime(ts).cast(timestamp)`` then immediately re-formats it to a
string (utils/spark_transforming.py:148-149), losing the typed column.  We
keep TimestampType end-to-end and format only at sink/comparison
boundaries.  Session timezone is pinned to UTC (session.py) so epoch math
is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Microsecond-precision display format — events.ts carries microseconds,
#: so second-precision formatting (the reference's "yyyy-MM-dd HH:mm:ss")
#: would silently collapse distinct instants.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def epoch_to_ts(col: Column | str) -> Column:
    """Epoch seconds → TimestampType (utils/spark_transforming.py:148)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


def ts_to_string(col: Column | str, fmt: str = TS_FORMAT) -> Column:
    """TimestampType → display string (utils/spark_transforming.py:149)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)
