"""Array (list-column) functions — per-row aggregates over list<numeric>
columns, the columnar counterpart of the reference's per-document array
keywords (items/minItems walk one row's list; these REDUCE it).

Pure per-batch kernels: Arrow list offsets drive segmented numpy
reductions (np.*.reduceat), so ragged rows, empty lists and nulls all
stay vectorized — no Python loop over rows, no materialized row lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_stats(ds, list_column: str, id_column: str):
    """Per-row statistics of a list<numeric> column: n (length), mean,
    min, max, l2 (Euclidean norm) — the embedding-health profile (zero
    vectors, exploded norms, truncated rows) before any ANN/dedup stage.

    Null rows are dropped; empty lists yield n=0 with NaN stats (SQL
    list_avg/list_min on [] are NULL — document COALESCE or filter in
    oracles). Segmented reduceat over the batch's flat values buffer —
    one pass, zero copies beyond the float64 upcast."""
    if id_column in ("n", "mean", "min", "max", "l2"):
        raise ValueError(f"list_stats: id_column {id_column!r} collides "
                         "with an output column")

    def kernel(t: pa.Table) -> pa.Table:
        col = t[list_column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        valid = pc.is_valid(col)
        if pc.any(pc.invert(valid)).as_py():
            keep = np.nonzero(valid.to_numpy(zero_copy_only=False))[0]
            t = t.take(pa.array(keep, pa.int64()))
            col = t[list_column]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        v = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        # offsets of a sliced array may not start at 0
        starts = offs[:-1] - offs[0]
        lens = np.diff(offs)
        n = len(lens)
        mean = np.full(n, np.nan)
        mn = np.full(n, np.nan)
        mx = np.full(n, np.nan)
        l2 = np.full(n, np.nan)
        ne = lens > 0
        if ne.any():
            s = starts[ne]
            sums = np.add.reduceat(v, s)
            sq = np.add.reduceat(v * v, s)
            mean[ne] = sums / lens[ne]
            mn[ne] = np.minimum.reduceat(v, s)
            mx[ne] = np.maximum.reduceat(v, s)
            l2[ne] = np.sqrt(sq)
        return pa.table({
            id_column: t[id_column],
            "n": pa.array(lens.astype(np.int64)),
            "mean": pa.array(mean),
            "min": pa.array(mn),
            "max": pa.array(mx),
            "l2": pa.array(l2)})

    return ds.map_batches(kernel, batch_format="pyarrow")
