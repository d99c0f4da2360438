"""Join operators Ray Data lacks natively (SURVEY.md brief: as-of / range
joins as custom operators), in the engine's broadcast-small-side shape:

- **as-of join**: for each left row, the latest right row whose timestamp is
  <= the left timestamp (optionally per key). The right side is collected,
  sorted, `ray.put` ONCE, and probed with vectorized `np.searchsorted`
  inside map_batches — no shuffle, no per-row Python.
- **range join**: left rows matched to right intervals [lo, hi) via the same
  broadcast + searchsorted machinery (non-overlapping intervals).

Partitioning assumption (documented): the RIGHT side fits in the object
store (dimension/quote tables — millions of rows, not billions). A
billions x billions as-of join would need a time-bucketed co-partition of
both sides (bucket = floor(ts/width) exchange, then per-bucket merge); the
broadcast path is the right default for the reference-data joins training
pipelines actually run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import collect_table


def _ts_us(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64()) \
        .to_numpy(zero_copy_only=False)


class _AsofProbe:
    """map_batches payload probing the broadcast sorted right side."""

    def __init__(self, right_ref, left_on: str, by: str | None,
                 value_columns: list[str], tolerance_us: int | None):
        self.right_ref = right_ref
        self.left_on = left_on
        self.by = by
        self.value_columns = value_columns
        self.tolerance_us = tolerance_us
        self._r = None

    def _right(self):
        if self._r is None:
            import ray

            h = self.right_ref
            self._r = ray.get(h) if hasattr(h, "hex") else h
        return self._r

    def __call__(self, batch: pa.Table) -> pa.Table:
        right = self._right()  # {key: (ts_sorted, {col: values})}
        ts = _ts_us(batch[self.left_on])
        n = batch.num_rows
        out_vals = {c: np.full(n, np.nan) for c in self.value_columns}
        matched = np.zeros(n, dtype=bool)
        if self.by is None:
            groups = {None: np.arange(n)}
        else:
            keys = batch[self.by].to_pylist()
            groups = {}
            for i, k in enumerate(keys):
                groups.setdefault(k, []).append(i)
            groups = {k: np.asarray(v) for k, v in groups.items()}
        for k, idx in groups.items():
            side = right.get(k)
            if side is None:
                continue
            r_ts, r_vals = side
            pos = np.searchsorted(r_ts, ts[idx], side="right") - 1
            ok = pos >= 0
            if self.tolerance_us is not None:
                ok &= (ts[idx] - r_ts[np.maximum(pos, 0)]) <= self.tolerance_us
            sel = idx[ok]
            matched[sel] = True
            for c in self.value_columns:
                out_vals[c][sel] = r_vals[c][pos[ok]]
        cols = {name: batch[name] for name in batch.column_names}
        for c in self.value_columns:
            cols[f"r_{c}"] = pa.array(out_vals[c])
        cols["asof_matched"] = pa.array(matched)
        return pa.table(cols)


class _RangeProbe:
    """map_batches payload: bucket left values into broadcast sorted
    non-overlapping [lo, hi) intervals via searchsorted."""

    def __init__(self, ref, on: str, label_column: str):
        self.ref = ref
        self.on = on
        self.label_column = label_column
        self._r = None

    def _right(self):
        if self._r is None:
            import ray

            h = self.ref
            self._r = ray.get(h) if hasattr(h, "hex") else h
        return self._r

    def __call__(self, batch: pa.Table) -> pa.Table:
        lows, highs, labels = self._right()
        arr = batch[self.on]
        v = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(lows, v, side="right") - 1
        ok = (pos >= 0) & np.isfinite(v)
        ok &= v < highs[np.maximum(pos, 0)]
        out = np.where(ok, labels[np.maximum(pos, 0)], -1)
        cols = {name: batch[name] for name in batch.column_names}
        cols[self.label_column] = pa.array(out.astype(np.int64))
        return pa.table(cols)


def range_join_broadcast(left, right, *, on: str, lo: str, hi: str,
                         label: str, label_column: str = "band"):
    """Label each left row with the id of the right interval [lo, hi)
    containing `on` (-1 when uncovered). Intervals must be non-overlapping;
    the right side is small and broadcast (dimension-table shape)."""
    import ray

    rt = collect_table(right)
    lows = rt[lo].to_numpy(zero_copy_only=False).astype(np.float64)
    highs = rt[hi].to_numpy(zero_copy_only=False).astype(np.float64)
    labels = rt[label].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(lows, kind="stable")
    ref = ray.put((lows[order], highs[order], labels[order]))
    return left.map_batches(_RangeProbe(ref, on, label_column),
                            batch_format="pyarrow")


def asof_join_broadcast(left, right, *, left_on: str, right_on: str,
                        by: str | None = None,
                        value_columns: list[str],
                        tolerance_s: float | None = None):
    """Left as-of join (backward): append `r_<col>` columns with the value of
    the latest right row at-or-before each left row's timestamp (per `by`
    key when given), plus an `asof_matched` flag.

    Right side: collected once on the driver, per-key sorted numpy arrays,
    broadcast via ray.put."""
    import ray

    rt = collect_table(right)
    r_ts = _ts_us(rt[right_on])
    keys = rt[by].to_pylist() if by is not None else [None] * rt.num_rows
    vals = {c: rt[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in value_columns}
    packed: dict = {}
    order = np.argsort(np.asarray(r_ts), kind="stable")
    for i in order:
        packed.setdefault(keys[i], [[], {c: [] for c in value_columns}])
        packed[keys[i]][0].append(r_ts[i])
        for c in value_columns:
            packed[keys[i]][1][c].append(vals[c][i])
    final = {k: (np.asarray(tss, dtype=np.int64),
                 {c: np.asarray(v) for c, v in cv.items()})
             for k, (tss, cv) in packed.items()}
    ref = ray.put(final)
    tol = int(tolerance_s * 1_000_000) if tolerance_s is not None else None
    return left.map_batches(
        _AsofProbe(ref, left_on, by, value_columns, tol),
        batch_format="pyarrow",
    )
