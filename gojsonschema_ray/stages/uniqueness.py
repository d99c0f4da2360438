"""Dataset-scope key uniqueness — `uniqueItems` lifted from one row's list
(reference validation.go:530-547) to 10^12 rows (SURVEY.md §2.6).

Strategy (scale-first):
1. **Pre-aggregate inside map_batches**: each batch collapses to (key, count)
   partials via an Arrow hash-group-by — duplicate-heavy batches shrink
   before anything moves.
2. **One keyed shuffle over the partials**: ``groupby(key).sum(count)`` —
   the all-to-all exchange moves at most one row per distinct key per block,
   not one row per input row.
3. **Skew**: a hot key (e.g. "clip-hot", 0.1% of all rows) arrives at the
   reducer already collapsed to one partial row per block, so the classic
   hot-reducer blowup cannot happen — the pre-aggregation IS the salting
   (count partials are associative). For hot-key *payload* pipelines (where
   rows, not counts, must co-locate) see the salted repartition helper.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import collect_rows


class KeyCountStage:
    """map_batches payload: batch → (key, cnt, part) partial counts.

    `part` is a deterministic hash partition of the key (coarse — ~#CPUs
    buckets) so the downstream exchange groups on a tiny int domain instead
    of paying Ray's sort-based groupby over every distinct key."""

    def __init__(self, key: str, n_parts: int = 32):
        self.key = key
        self.n_parts = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .sketches import hash_arrow_array

        g = batch.select([self.key]).group_by(self.key).aggregate([(self.key, "count")])
        g = g.rename_columns([self.key, "cnt"])
        part = (hash_arrow_array(g[self.key]) % np.uint64(self.n_parts)).astype(np.int32)
        return g.append_column("part", pa.array(part))


def aggregate_key_counts(partials, key: str, min_count: int = 2):
    """(key, n) totals with n >= min_count, from (key, cnt, part) partials.

    ONE exchange keyed on the coarse `part` column (~#CPUs distinct values —
    trivially sortable), then a vectorized pandas groupby per partition.
    Skew-proof: partials are already collapsed per block, so even a key
    holding 50% of all rows contributes ≤ one row per block to its bucket."""
    import pandas as pd

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False, sort=False, dropna=True)["cnt"].sum()
        g = g[g["cnt"] >= min_count]
        return g.rename(columns={"cnt": "n"})

    # consolidate + materialize the fixed-width partials before the exchange:
    # Ray's sort-based groupby cost is driven by input block COUNT (hundreds
    # of micro-blocks -> ~10x slower than ~#CPUs consolidated blocks) and it
    # re-executes a lazy upstream while sampling sort boundaries; repartition
    # itself samples nothing, so one materialize after it is enough
    parts = partials.repartition(32).materialize()
    return parts.groupby("part").map_groups(per_part, batch_format="pandas")


def duplicate_keys(ds, key: str):
    """Dataset of (key, n_rows) for keys appearing more than once.

    NULL keys are ignored (absent property, matching the engine's
    null-as-absent mapping)."""
    partials = ds.map_batches(KeyCountStage(key), batch_format="pyarrow")
    dups = aggregate_key_counts(partials, key, min_count=2)
    return dups.map_batches(
        lambda t: t.filter(pc.is_valid(t[key])).rename_columns([key, "n_rows"]),
        batch_format="pyarrow",
    )


def uniqueness_violations(ds, key: str):
    """Violation rows (key, keyword='unique', path, expected, actual) for
    duplicated keys — same shape as the per-row violation table (F4)."""
    dups = duplicate_keys(ds, key)

    def to_violations(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": pc.cast(t[key], pa.string()),
            "keyword": pa.array(["unique"] * n),
            "path": pa.array([f"(root).{key}"] * n),
            "expected": pa.array([f"unique {key}"] * n),
            "actual": pc.cast(t["n_rows"], pa.string()),
        })

    return dups.map_batches(to_violations, batch_format="pyarrow")


def add_salted_key(batch: pa.Table, key: str, hot_keys: set, salt_buckets: int,
                   seed_col: str | None = None) -> pa.Table:
    """Append a shuffle key = hash(key) with hot keys salted into sub-buckets.

    Used when row *payloads* (not counts) must be co-located by key and a few
    keys are orders of magnitude hotter than the rest: the hot keys spread
    over `salt_buckets` sub-partitions; consumers merge the salted groups in
    a cheap second pass."""
    import pandas as pd

    keys = batch[key].to_pandas()
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy(dtype=np.uint64)
    if hot_keys:
        hot = keys.isin(list(hot_keys)).to_numpy()
        if hot.any():
            salt = np.arange(len(keys), dtype=np.uint64) % np.uint64(salt_buckets)
            h = np.where(hot, h ^ (salt * np.uint64(0x9E3779B97F4A7C15)), h)
    return batch.append_column("_shuffle_key", pa.array(h.astype(np.int64)))


def top_hot_keys(ds, key: str, sample_frac: float = 0.01, top_k: int = 16,
                 min_share: float = 0.001) -> set:
    """Sample-based hot-key scan (pre-shuffle skew detection): keys whose
    sampled share exceeds `min_share` of rows."""
    sample = ds.random_sample(sample_frac, seed=42).materialize()
    n_sample = max(1, sample.count())
    counts = sample.map_batches(KeyCountStage(key), batch_format="pyarrow") \
        .groupby(key).sum("cnt")
    rows = collect_rows(counts.sort("sum(cnt)", descending=True).limit(top_k))
    # a key's sampled share IS its estimated true share (uniform sampling)
    return {r[key] for r in rows
            if r["sum(cnt)"] / n_sample >= min_share and r[key] is not None}


def grouped_nunique(ds, key_column: str, value_column: str,
                    n_parts: int | None = None):
    """EXACT per-key distinct-value counts — COUNT(DISTINCT value) GROUP BY
    key, the cardinality profile of a feature column (distinct active days
    per user, distinct sources per document, ...).

    Combiner-first, same scale shape as key uniqueness: each batch collapses
    to its distinct (key, value) pairs (duplicate-heavy batches shrink
    before anything moves), ONE hash(key) coarse-partition exchange of the
    pair partials, then a per-partition pandas dedup + size. The exchange
    moves at most one row per distinct (key, value) pair per batch — never
    input rows. Null values are ignored (SQL COUNT(DISTINCT) semantics);
    null keys are kept as their own group (use a filter upstream if not
    wanted). Returns a Dataset of (key, n_distinct)."""
    import pandas as pd

    from .dedup import _next_pow2, _shuffle_parts
    from .sketches import hash_arrow_array

    P = _next_pow2(n_parts or _shuffle_parts())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key_column, value_column]]
        d = d[d[value_column].notna()].drop_duplicates()
        h = hash_arrow_array(d[key_column])
        return d.assign(part=(h % np.uint64(P)).astype("int32"))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([key_column, value_column])
        g = d.groupby(key_column, sort=False, dropna=False).size() \
            .reset_index(name="n_distinct")
        g["n_distinct"] = g["n_distinct"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    parts = partials.repartition(P).materialize()
    return parts.groupby("part").map_groups(per_part, batch_format="pandas")
