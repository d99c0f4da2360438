"""Deduplication operators for training-data pipelines — `uniqueItems`
generalized from one row's list to corpus scope, in five flavors:

- **exact**: hash-partitioned group-by on the normalized text (or its hash at
  scale) → keep-first / emit duplicate groups
- **MinHash + LSH**: shingle → minhash signature → band → bucket groupby →
  candidate pairs → exact n-gram Jaccard verify. The ONLY shuffle moves
  (band, bucket_hash, doc_id) triples — constant size per doc regardless of
  document length.
- **SimHash**: 64-bit signature, near-dup candidates via 4×16-bit band
  pigeonhole (hamming ≤ 3 ⇒ at least one band equal), verified by hamming
- **n-gram Jaccard**: the exact verifier, usable standalone on candidate sets
- **embedding cosine**: random-hyperplane LSH buckets → within-bucket pairwise
  cosine (numpy matmul), threshold

All stages follow the partial/shuffle-small pattern: per-batch map work is
vectorized numpy; group-bys exchange fixed-width keys, never documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_strings(values) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_duplicate_groups(ds, column: str, by_hash: bool = False):
    """(value|hash, n) for values occurring more than once.

    by_hash=True groups on a 64-bit content hash instead of the raw value —
    the at-scale mode (shuffle rows shrink to 8 bytes/key); collisions are
    ~n²/2⁶⁴ and can be re-verified within groups."""
    if by_hash:
        def project(t: pa.Table) -> pa.Table:
            h = _hash_strings(t[column].to_pandas())
            return pa.table({"h": pa.array(h.astype(np.int64))}) \
                .group_by("h").aggregate([("h", "count")]) \
                .rename_columns(["h", "cnt"])

        partials = ds.map_batches(project, batch_format="pyarrow")
        totals = partials.groupby("h").sum("cnt")
        key = "h"
    else:
        def project(t: pa.Table) -> pa.Table:
            return t.select([column]).group_by(column) \
                .aggregate([(column, "count")]).rename_columns([column, "cnt"])

        partials = ds.map_batches(project, batch_format="pyarrow")
        totals = partials.groupby(column).sum("cnt")
        key = column
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t["sum(cnt)"], 1))
                   .rename_columns([key, "n"]),
        batch_format="pyarrow",
    )


def dedup_exact(ds, column: str, id_column: str):
    """Keep-first exact dedup: one representative id per distinct value.
    Hash-partitioned groupby; returns the surviving ids Dataset."""
    def project(t: pa.Table) -> pa.Table:
        return t.select([column, id_column]).group_by(column) \
            .aggregate([(id_column, "min")]) \
            .rename_columns([column, id_column])

    partials = ds.map_batches(project, batch_format="pyarrow")
    return partials.groupby(column).min(id_column)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-gram shingle hash set (uint64)."""
    if not text or len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    return np.unique(_hash_strings(grams))


class MinHasher:
    """num_perm universal-hash permutations h'=(a*h+b) mod p, vectorized."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (P, S) matrix of permuted hashes → min over shingles
        h = shingle_hashes[None, :]
        vals = (self.a[:, None] * h + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


class MinHashLSHStage:
    """map_batches payload: doc → `bands` rows of (band, bucket, id).

    Stateful (permutation tables built once) → run as an actor pool."""

    def __init__(self, text_column: str, id_column: str, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 5, seed: int = 42):
        assert num_perm % bands == 0
        self.text_column = text_column
        self.id_column = id_column
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.hasher = MinHasher(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        ids = batch[self.id_column].to_pylist()
        band_col, bucket_col, id_col = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.hasher.signature(shingles(text or "", self.shingle_k))
            sig_bands = sig.reshape(self.bands, self.rows_per_band)
            buckets = pd.util.hash_array(
                np.ascontiguousarray(sig_bands).view(
                    [("", np.uint64)] * self.rows_per_band).ravel()
            ).astype(np.int64)
            band_col.extend(range(self.bands))
            bucket_col.extend(buckets.tolist())
            id_col.extend([doc_id] * self.bands)
        return pa.table({
            "band": pa.array(band_col, pa.int32()),
            "bucket": pa.array(bucket_col, pa.int64()),
            self.id_column: pa.array(id_col),
        })


def _pairs_from_groups(group: pd.DataFrame, id_column: str) -> pd.DataFrame:
    ids = sorted(set(group[id_column].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def minhash_candidate_pairs(ds, text_column: str, id_column: str,
                            num_perm: int = 128, bands: int = 16,
                            shingle_k: int = 5, concurrency: int = 4):
    """Candidate near-dup id pairs from LSH buckets (deduplicated)."""
    sigs = ds.map_batches(
        MinHashLSHStage,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
    pairs = sigs.groupby(["band", "bucket"]).map_groups(
        lambda g: _pairs_from_groups(g, id_column), batch_format="pandas",
    )
    # dedup pairs discovered in multiple bands (small: pairs only)
    return pairs.groupby(["id_a", "id_b"]).count()


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingles(text_a or "", k), shingles(text_b or "", k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_near_duplicates(ds, text_column: str, id_column: str, *,
                            threshold: float = 0.7, num_perm: int = 128,
                            bands: int = 16, shingle_k: int = 5,
                            concurrency: int = 4):
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.

    The verify joins text back by broadcasting candidate ids (candidates are
    sparse — a tiny fraction of the corpus) and filtering the corpus with
    `pc.is_in`; pairs then verify in a small driver-side pass. For dense
    candidate sets switch the verify to a bucketed map_groups join."""
    import ray

    cand = minhash_candidate_pairs(ds, text_column, id_column,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, concurrency=concurrency)
    pair_rows = cand.take_all()
    if not pair_rows:
        return []
    needed = sorted({r["id_a"] for r in pair_rows} | {r["id_b"] for r in pair_rows})
    needed_arr = pa.array(needed)
    texts_ds = ds.map_batches(
        lambda t: t.select([id_column, text_column]).filter(
            pc.is_in(t[id_column], value_set=needed_arr)),
        batch_format="pyarrow",
    )
    id2text = {}
    for b in texts_ds.iter_batches(batch_format="pyarrow"):
        id2text.update(zip(b[id_column].to_pylist(), b[text_column].to_pylist()))
    out = []
    for r in pair_rows:
        j = ngram_jaccard(id2text.get(r["id_a"]), id2text.get(r["id_b"]), shingle_k)
        if j >= threshold:
            out.append({"id_a": r["id_a"], "id_b": r["id_b"], "jaccard": j})
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency weighted)."""
    if not text:
        return 0
    toks = text.split()
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    h = pd.util.hash_array(uniq).astype(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for b in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return int(out)


class SimHashStage:
    def __init__(self, text_column: str, id_column: str):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        hashes = np.array([simhash64(t or "") for t in texts], dtype=np.uint64)
        cols = {self.id_column: batch[self.id_column],
                "simhash": pa.array(hashes.astype(np.int64))}
        for band in range(4):
            chunk = (hashes >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            cols[f"band{band}"] = pa.array(chunk.astype(np.int32))
        return pa.table(cols)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_near_duplicates(ds, text_column: str, id_column: str,
                            max_hamming: int = 3):
    """Near-dup pairs with hamming(simhash) <= max_hamming (<=3 guaranteed
    found by the 4-band pigeonhole; band groupby is the only shuffle)."""
    sig = ds.map_batches(SimHashStage(text_column, id_column),
                         batch_format="pyarrow")
    seen_pairs = set()
    out = []
    for band in range(4):
        grouped = sig.groupby(f"band{band}").map_groups(
            lambda g: _simhash_band_pairs(g, id_column, max_hamming),
            batch_format="pandas",
        )
        for r in grouped.take_all():
            key = (r["id_a"], r["id_b"])
            if key not in seen_pairs:
                seen_pairs.add(key)
                out.append(r)
    return out


def _simhash_band_pairs(group: pd.DataFrame, id_column: str,
                        max_hamming: int) -> pd.DataFrame:
    rows = list(zip(group[id_column].tolist(),
                    group["simhash"].astype(np.int64).tolist()))
    a_out, b_out, d_out = [], [], []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = hamming64(rows[i][1] & 0xFFFFFFFFFFFFFFFF,
                          rows[j][1] & 0xFFFFFFFFFFFFFFFF)
            if d <= max_hamming:
                ia, ib = sorted((rows[i][0], rows[j][0]))
                a_out.append(ia)
                b_out.append(ib)
                d_out.append(d)
    return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": d_out})


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
class HyperplaneLSHStage:
    """Multi-table random-hyperplane LSH: `n_tables` independent tables of
    `n_planes` hyperplanes each. A near-dup pair is a candidate if it shares
    a bucket in ANY table — a single unlucky hyperplane near the pair can't
    hide it (single-table LSH misses ~n_planes·θ/π of true pairs).
    Fixed seed → identical planes on every worker."""

    def __init__(self, embedding_column: str, id_column: str, dim: int,
                 n_planes: int = 8, n_tables: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, n_planes))
        self.n_tables = n_tables
        self.embedding_column = embedding_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch[self.embedding_column].to_pylist()).astype(np.float64)
        ids = batch[self.id_column]
        tables, buckets, out_ids, out_emb = [], [], [], []
        emb_list = batch[self.embedding_column].to_pylist()
        for t in range(self.n_tables):
            signs = (emb @ self.planes[t]) > 0
            bk = signs @ (1 << np.arange(signs.shape[1]))
            tables.extend([t] * len(bk))
            buckets.extend(bk.astype(np.int64).tolist())
            out_ids.extend(ids.to_pylist())
            out_emb.extend(emb_list)
        return pa.table({
            "table": pa.array(tables, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            self.id_column: pa.array(out_ids),
            self.embedding_column: pa.array(out_emb),
        })


def embedding_near_duplicates(ds, embedding_column: str, id_column: str,
                              dim: int, threshold: float = 0.95,
                              n_planes: int = 8, n_tables: int = 4):
    """Cosine near-dup pairs within multi-table hyperplane-LSH buckets.
    Pairs found in several tables are deduplicated by a final groupby."""
    bucketed = ds.map_batches(
        HyperplaneLSHStage,
        fn_constructor_kwargs=dict(embedding_column=embedding_column,
                                   id_column=id_column, dim=dim,
                                   n_planes=n_planes, n_tables=n_tables),
        batch_format="pyarrow", concurrency=2, num_cpus=1,
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_column].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        m = np.stack(group[embedding_column].tolist()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sim = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sim[iu, ju] >= threshold
        return pd.DataFrame({
            "id_a": [min(ids[i], ids[j]) for i, j in zip(iu[keep], ju[keep])],
            "id_b": [max(ids[i], ids[j]) for i, j in zip(iu[keep], ju[keep])],
            "cosine": sim[iu, ju][keep],
        })

    found = bucketed.groupby(["table", "bucket"]).map_groups(
        pairs, batch_format="pandas")
    return found.groupby(["id_a", "id_b"]).max("cosine")
