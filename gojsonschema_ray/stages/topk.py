"""Streaming global top-k — replaces `ds.sort(...).limit(k)`'s all-to-all
exchange with per-block partials.

`ds.sort` moves EVERY block through a range-partitioned shuffle to return k
rows. Here each block keeps its local top-k inside map_batches (any global
top-k row is in its block's top-k under the same total ordering), and the
driver merges only blocks × k rows with one final sort. Linear scan, zero
shuffle. Include a tiebreaker column in `sort_keys` to make the ordering
total — otherwise boundary ties are resolved arbitrarily (same caveat as
any top-k).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..util import collect_table


def _top_of(t: pa.Table, sort_keys: list[tuple[str, str]], k: int) -> pa.Table:
    # slicing past the end is safe: returns all rows when num_rows <= k
    return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])


def global_top_k(ds, sort_keys: list[tuple[str, str]], k: int) -> pa.Table:
    """Top-k rows of `ds` under `sort_keys` ([(column, 'ascending' |
    'descending'), ...]) as a pyarrow Table. One streaming pass; the driver
    sees blocks x k rows, never the dataset."""
    def partial(t: pa.Table) -> pa.Table:
        return _top_of(t, sort_keys, k)

    merged = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
    if merged.num_rows == 0:
        return merged
    return _top_of(merged, sort_keys, k)
