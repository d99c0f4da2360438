"""Distributed graph analytics over edge tables — triangle counting.

The engine already walks graphs for dedup (connected components,
stages/dedup.near_dup_clusters) and entity resolution; this module adds
the classic clustering-coefficient primitive: EXACT triangle counting by
the wedge-join algorithm (the MapReduce-era NodeIterator++ / Suri-Vassilvitskii
WWW'11 shape), expressed as two coarse hash exchanges:

  1. canonicalize edges (u < v, loops and nulls dropped, distinct) —
     the unique_pairs-style pair exchange;
  2. wedge generation — ONE hash(u) exchange; per partition, each
     vertex's sorted neighbor list emits its C(d, 2) wedge candidates
     via vectorized triu indices (a per-vertex degree cap fails loudly:
     a 10^6-degree hub would emit 10^12 wedges — salt or sample such
     graphs upstream);
  3. wedge ∩ edge membership — ONE hash(pair) exchange over the tagged
     union; per partition a vectorized pandas inner-merge counts closed
     wedges.

Exactly-once counting: edges are canonical (a < b), so a vertex's
neighbor list holds only HIGHER-numbered vertices; the triangle
{a < b < c} generates its (b, c) wedge only at a — its minimum vertex —
and nowhere else (the oriented-wedge trick), so no division at the end.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def triangle_count(ds, src: str, dst: str, *, max_degree: int = 10_000):
    """EXACT triangle count of the undirected graph given by an edge
    table (duplicate edges, loops, and direction are normalized away).
    Returns (n_triangles:int, n_edges:int). Oriented wedges: each vertex
    emits pairs among its HIGHER-numbered neighbors only, so every
    triangle is generated exactly once (at its minimum vertex)."""
    import pandas as pd

    from ..util import collect_rows
    from .dedup import _next_pow2, _shuffle_parts
    from .sketches import hash_arrow_array

    P = _next_pow2(_shuffle_parts())

    def canon(t: pa.Table) -> pa.Table:
        u = t[src].cast(pa.int64())
        v = t[dst].cast(pa.int64())
        ok = pc.and_(pc.is_valid(u), pc.is_valid(v))
        ok = pc.and_(ok, pc.not_equal(u, v))       # drop loops
        u, v = u.filter(ok), v.filter(ok)
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        g = pa.table({"a": lo, "b": hi}).group_by(["a", "b"]) \
            .aggregate([])                          # batch-local distinct
        part = (hash_arrow_array(g["a"]) % np.uint64(P)).astype(np.int32)
        return g.append_column("part", pa.array(part))

    # exchange 1+2 fused: edges co-partitioned by a; per-partition
    # distinct + wedge generation
    edges = ds.map_batches(canon, batch_format="pyarrow") \
        .repartition(P).materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["a", "b"])
        outs_b, outs_c = [], []
        for _, grp in df.groupby("a", sort=False):
            nb = np.sort(grp["b"].to_numpy(dtype=np.int64))
            d = len(nb)
            if d < 2:
                continue
            if d > max_degree:
                raise ValueError(
                    f"triangle_count: vertex degree {d} > max_degree="
                    f"{max_degree} — salt or sample hub vertices upstream")
            iu = np.triu_indices(d, k=1)
            outs_b.append(nb[iu[0]])
            outs_c.append(nb[iu[1]])
        if not outs_b:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int8")})
        return pd.DataFrame({
            "a": np.concatenate(outs_b),
            "b": np.concatenate(outs_c),
            "w": np.ones(sum(len(x) for x in outs_b), dtype=np.int8)})

    wedge_ds = edges.groupby("part").map_groups(wedges,
                                                batch_format="pandas")

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"],
                         "w": pa.array(np.zeros(t.num_rows, np.int8))})

    def pair_part(t: pa.Table) -> pa.Table:
        h = hash_arrow_array(t["a"]) * np.uint64(0x9E3779B97F4A7C15) \
            ^ hash_arrow_array(t["b"])
        return t.append_column(
            "ppart", pa.array((h % np.uint64(P)).astype(np.int32)))

    both = edges.map_batches(tag_edges, batch_format="pyarrow") \
        .union(wedge_ds) \
        .map_batches(pair_part, batch_format="pyarrow") \
        .repartition(P).materialize()

    def close(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["w"] == 0][["a", "b"]].drop_duplicates()
        w = df[df["w"] == 1][["a", "b"]]
        n = len(w.merge(e, on=["a", "b"], how="inner")) if len(w) else 0
        ne = len(e)
        return pd.DataFrame({"tri": pd.Series([n], dtype="int64"),
                             "edges": pd.Series([ne], dtype="int64")})

    parts = collect_rows(both.groupby("ppart").map_groups(
        close, batch_format="pandas"))
    return (int(sum(r["tri"] for r in parts)),
            int(sum(r["edges"] for r in parts)))
