"""Tumbling-window aggregation over a timestamp column — one of the custom
operators Ray Data lacks natively (SURVEY.md §2.5: the reference has no
windowing either; this is a dataset-level capability of the engine).

Composition (no raw Ray tasks needed):
    map_batches: window_start = floor(ts / width)      # pure Arrow math
      → per-batch partial aggregates per (window, key)  # combiner
      → coarse-partition exchange + vectorized merge    # same scale shape as
                                                        #   stages/uniqueness.py

The shuffle moves one partial row per (window, key) per block — bounded by
block count x active windows, independent of row count. Partitioning
assumption: none beyond hash(window,key) balance; a single globally-hot
window collapses per block before it travels (the combiner IS the skew
defense, like the uniqueness counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_aggregate(ds, ts_column: str, value_column: str,
                              width_s: int, by: str | None = None,
                              n_parts: int = 32):
    """Per-window (and optional per-`by`-key) count/sum/min/max/mean of
    `value_column`. Returns a Dataset with columns
    (window_start: timestamp[us], [by,] n, sum, min, max, mean)."""
    from .sketches import hash_arrow_array

    width_us = np.int64(width_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        # normalize any timestamp unit (ns from pandas, us from parquet) to us
        ts = pc.cast(pc.cast(t[ts_column], pa.timestamp("us")), pa.int64())
        # integer FLOOR division (pc.divide truncates toward zero, which
        # would misassign pre-epoch timestamps); exact at boundaries where
        # float64 would wobble for large epochs
        q = pc.multiply(pc.divide(ts, width_us), width_us)
        win = pc.if_else(pc.greater(q, ts), pc.subtract(q, width_us), q)
        cols = {"w": win, "v": t[value_column]}
        keys = ["w"]
        if by is not None:
            cols[by] = t[by]
            keys.append(by)
        g = pa.table(cols).group_by(keys).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])
        g = g.rename_columns(keys + ["n", "s", "mn", "mx"])
        part = (hash_arrow_array(g["w"]) % np.uint64(n_parts)).astype(np.int32)
        return g.append_column("part", pa.array(part))

    group_keys = ["w"] + ([by] if by is not None else [])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_keys, as_index=False, sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(n_parts).materialize()
    merged = parts.groupby("part").map_groups(per_part, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        cols = {
            "window_start": pc.cast(t["w"], pa.timestamp("us")),
        }
        if by is not None:
            cols[by] = t[by]
        cols.update({
            "n": t["n"],
            "sum": t["s"],
            "min": t["mn"],
            "max": t["mx"],
            "mean": pc.divide(pc.cast(t["s"], pa.float64()),
                              pc.cast(t["n"], pa.float64())),
        })
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")
