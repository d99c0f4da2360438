"""End-to-end training-corpus curation — the composition every LLM data
pipeline runs, built from the engine's verified stages:

    quality (Gopher rules)  →  exact dedup (keep-first)  →
    n-gram decontamination (GPT-3 recipe)  →  chunk accounting

Each stage keeps its own scale shape, so the composition inherits them:

- quality:     inline per-batch verdict filter (`functions.text._gopher_kernel`
               appended to the corpus batch) — NO exchange, the corpus streams;
- exact dedup: ONE coarse (text, min-id) partial exchange
               (`stages.dedup.dedup_exact` — partials are per-batch collapsed,
               skew-bounded);
- decontam:    reference gram hashes ray.put-broadcast once, per-batch
               searchsorted probe (`stages.similarity.decontaminate_ngrams`
               mode="keep") — NO exchange;
- accounting:  pure per-batch kernel (RE2 token count + the
               `functions.text.chunk_documents` closed-form chunk count).

The result is one row per SURVIVING document: (id, n_tokens, n_chunks) —
duplicate-bounded audit output, never the corpus text. Callers wanting the
curated text itself take the decontaminated Dataset via `keep_text=True`
(rows are (text, id), ready for chunk_documents / pack_sequences)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_count(n_tokens: np.ndarray, max_tokens: int,
                stride: int) -> np.ndarray:
    """Closed-form number of overlapping chunks `chunk_documents` emits for
    an n-token doc: windows start every `stride` tokens; the last chunk is
    the first whose end reaches the doc — 1 + ceil(max(n - max_tokens, 0)
    / stride)."""
    n = np.asarray(n_tokens, dtype=np.int64)
    return 1 + (np.maximum(n - max_tokens, 0) + stride - 1) // stride


def curate_documents(ds, reference, *, text_column: str = "text",
                     id_column: str = "doc_id", k: int = 20,
                     chunk_max_tokens: int = 8, chunk_stride: int = 5,
                     keep_text: bool = False, gopher_kwargs: dict | None = None):
    """Run the full curation composition over a document Dataset.

    `reference` is the eval/benchmark set to decontaminate against (a
    Dataset with `text_column`, or a list of strings). Stage order matters
    and is part of the contract: dedup picks the min-id survivor among
    QUALITY-KEPT docs only, and decontamination filters the deduped
    survivors (mirroring the SQL oracle's CTE chain).

    Returns (id, n_tokens, n_chunks) per surviving doc, or the curated
    (text, id) Dataset when `keep_text=True`."""
    from ..functions.text import _gopher_kernel, token_count_batch
    from ..stages.dedup import dedup_exact
    from ..stages.similarity import decontaminate_ngrams

    gk = dict(min_tokens=50, max_tokens=100_000, min_mean_word_len=3.0,
              max_mean_word_len=10.0, max_dup_token_frac=0.6,
              max_top_token_frac=0.2, min_stop_hits=2)
    gk.update(gopher_kwargs or {})

    def quality(t: pa.Table) -> pa.Table:
        v = _gopher_kernel(t, text_column=text_column, id_column=id_column,
                           **gk)
        return t.filter(pc.equal(v["keep"], 1))

    kept = ds.map_batches(quality, batch_format="pyarrow")
    # dedup_exact returns (text, id) survivors — text IS the dedup key, so
    # the payload the next stage needs rides the (already collapsed) exchange
    uniq = dedup_exact(kept, text_column, id_column)
    clean = decontaminate_ngrams(uniq, reference, text_column=text_column,
                                 id_column=id_column, k=k, mode="keep")
    if keep_text:
        return clean

    def accounting(t: pa.Table) -> pa.Table:
        n = token_count_batch(t[text_column])
        return pa.table({
            id_column: t[id_column],
            "n_tokens": pa.array(n),
            "n_chunks": pa.array(chunk_count(n, chunk_max_tokens,
                                             chunk_stride)),
        })

    return clean.map_batches(accounting, batch_format="pyarrow")
