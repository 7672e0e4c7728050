"""Tiled (sawtooth) sliding-window aggregation — batch form.

The reference pre-aggregates cumulative tiles at ``hop_size`` and
subtracts tiles to assemble sliding windows, with the tiling state held
in pandas on the DRIVER (``infra/compute_engines/spark/nodes.py:248-362``,
``aggregation/tiling/{orchestrator,tile_subtraction}.py``) — a
non-distributed design. This module is the distributed re-expression
(SURVEY §2.4 "batch: two-level agg"):

1. tile: ``groupBy(keys, window(ts, hop))`` — ONE pass over the raw data
   (partial agg map-side), emitting per-tile partial aggregates;
2. assemble: a window-frame sum over the (tiny) tile table — each sliding
   window of size ``window = n x hop`` is the sum of its n tiles via
   ``rangeBetween`` on the tile index.

Cost: raw data is touched once regardless of the window/slide ratio; the
frame scan runs over |keys| x |tiles| rows only. Supports the decomposable
aggregates feast's tiling supports (sum/count -> avg, min/max are
tile-decomposable too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TILEABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def tiled_sliding_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    hop_seconds: int,
    functions: tuple[str, ...] = ("sum", "count"),
) -> DataFrame:
    """Sliding-window aggregates via hop-sized tiles + frame sums.

    Output: keys, window_start, window_end, {fn}_{col} per function —
    identical values to ``groupBy(keys, F.window(ts, window, hop))`` but
    with one scan of the raw data and a frame pass over tiles.
    """
    if window_seconds % hop_seconds != 0:
        raise ValueError("window must be a multiple of hop")
    n_tiles = window_seconds // hop_seconds
    for fn in functions:
        if fn not in _TILEABLE:
            raise ValueError(f"{fn} is not tile-decomposable")

    tiles = (
        df.groupBy(*keys, F.window(ts_col, f"{hop_seconds} seconds").alias("__t"))
        .agg(
            *[
                _TILEABLE[fn](value_col).alias(f"__tile_{fn}")
                for fn in functions
            ]
        )
        .withColumn(
            "__tile_idx", (F.unix_timestamp("__t.start") / hop_seconds).cast("long")
        )
    )

    # each tile belongs to the n_tiles sliding windows whose start lies in
    # (tile_idx - n_tiles, tile_idx]; explode tile -> member windows and
    # re-aggregate. Exactly F.window(ts, window, hop) semantics including
    # tile gaps (a window appears iff >= 1 of its tiles has data), but the
    # raw data was scanned only once and this pass runs over tiles only.
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    contrib = tiles.withColumn(
        "__w_idx",
        F.explode(
            F.sequence(
                F.col("__tile_idx") - F.lit(n_tiles - 1), F.col("__tile_idx")
            )
        ),
    )
    out = contrib.groupBy(*keys, "__w_idx").agg(
        *[
            merge[fn](f"__tile_{fn}").alias(f"{fn}_{value_col}")
            for fn in functions
        ]
    )
    out = out.withColumn(
        "window_start", F.timestamp_seconds(F.col("__w_idx") * hop_seconds)
    ).withColumn(
        "window_end",
        F.col("window_start") + F.expr(f"INTERVAL {window_seconds} SECONDS"),
    )
    return out.select(
        *keys, "window_start", "window_end",
        *[f"{fn}_{value_col}" for fn in functions],
    )
