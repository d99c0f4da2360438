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


# ---------------------------------------------------------------------------
# audio-corpus curation — the clips sibling of curate_documents
# ---------------------------------------------------------------------------
AUDIO_VERDICT_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("keep", pa.bool_()),
    ("reasons", pa.string()),
    ("fp", pa.string()),
    ("n_samples", pa.int64()),
    ("rms_dbfs", pa.float64()),
    ("active_ratio", pa.float64()),
])

# fixed signal order — reasons strings are deterministic and comparable
AUDIO_REASONS = ("decode", "too_short", "too_long", "silent", "clipped",
                 "inactive")


class AudioCurationStage:
    """ONE decode per clip feeding every curation signal (the fusion lesson
    from CombinedClipChecker: a union of per-signal stages would re-decode
    the corpus per signal). Per clip: duration bounds, RMS silence gate,
    clipping fraction, VAD active-ratio (`stages.audio.activity_segments`),
    and — for KEPT clips only, so dropped rows never pay the FFT — a
    content fingerprint: blake2b of the clip's mean log-mel vector
    (`stages.audio.log_mel_features`), gain-sensitive but codec/container
    invariant (wav vs raw PCM of the same samples hash identically).

    Emits one verdict row per clip with the failing reasons in the fixed
    `AUDIO_REASONS` order (every failing signal listed, gopher_filter
    style). Mel filterbanks build once per actor per sample rate."""

    def __init__(self, min_ms: float = 20.0, max_ms: float = 3_600_000.0,
                 min_rms_dbfs: float = -35.0,
                 max_clipped_frac: float = 0.01,
                 min_active_ratio: float = 0.5, frame_ms: int = 20,
                 threshold_dbfs: float = -40.0, hang_frames: int = 2,
                 n_fft: int = 128, hop: int = 64, n_mels: int = 16):
        self.min_ms, self.max_ms = min_ms, max_ms
        self.min_rms_dbfs = min_rms_dbfs
        self.max_clipped_frac = max_clipped_frac
        self.min_active_ratio = min_active_ratio
        self.frame_ms, self.threshold_dbfs = frame_ms, threshold_dbfs
        self.hang_frames = hang_frames
        self.n_fft, self.hop, self.n_mels = n_fft, hop, n_mels
        self._fb: dict[int, np.ndarray] = {}

    def _bank(self, sr: int) -> np.ndarray:
        from ..stages.audio import mel_filterbank

        fb = self._fb.get(sr)
        if fb is None:
            fb = mel_filterbank(sr, self.n_fft, self.n_mels)
            self._fb[sr] = fb
        return fb

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..stages.audio import (_FS, activity_segments,
                                    decoded_pcm_rows, log_mel_features)

        rows = []
        for _, cid, sr, pcm in decoded_pcm_rows(batch):
            if pcm is None:
                rows.append({"clip_id": cid, "keep": False,
                             "reasons": "decode", "fp": None,
                             "n_samples": None, "rms_dbfs": None,
                             "active_ratio": None})
                continue
            n = len(pcm)
            ms = n * 1000.0 / sr
            rms_dbfs = ratio = None
            clipped = 0.0
            if n:
                xf = pcm.astype(np.float64)
                rms = float(np.sqrt(np.mean(xf * xf)))
                rms_dbfs = float(20 * np.log10(max(rms, 1e-12) / _FS))
                clipped = float(np.count_nonzero(np.abs(xf) >= _FS) / n)
                ratio = activity_segments(
                    pcm, sr, frame_ms=self.frame_ms,
                    threshold_dbfs=self.threshold_dbfs,
                    hang_frames=self.hang_frames)["active_ratio"]
            bad = {
                "too_short": ms < self.min_ms,
                "too_long": ms > self.max_ms,
                "silent": rms_dbfs is None or rms_dbfs < self.min_rms_dbfs,
                "clipped": clipped > self.max_clipped_frac,
                "inactive": ratio is None or ratio < self.min_active_ratio,
            }
            reasons = [r for r in AUDIO_REASONS if bad.get(r)]
            fp = None
            if not reasons:  # fingerprint only what survives the gates
                _, mel = log_mel_features(pcm, sr, self._bank(sr),
                                          n_fft=self.n_fft, hop=self.hop)
                fp = hashlib.blake2b(mel.tobytes(),
                                     digest_size=16).hexdigest()
            rows.append({"clip_id": cid, "keep": not reasons,
                         "reasons": ",".join(reasons), "fp": fp,
                         "n_samples": n, "rms_dbfs": rms_dbfs,
                         "active_ratio": ratio})
        return pa.Table.from_pylist(rows, schema=AUDIO_VERDICT_SCHEMA)


def curate_clips(ds, *, return_verdicts: bool = False, concurrency=(1, 8),
                 batch_size: int = 256, **stage_kwargs):
    """End-to-end audio-corpus curation: quality gates → content dedup.

        decode+gates (ONE decode, per-batch, NO exchange — the corpus
        streams)  →  keep-filter  →  exact content dedup on the log-mel
        fingerprint (`stages.dedup.dedup_exact`: per-batch (fp, min-id)
        partials, ONE coarse exchange — survivors are fingerprint-count
        sized, never the corpus).

    Returns the surviving (fp, clip_id) Dataset — one representative clip
    per distinct audio content among quality-kept clips (min clip_id wins,
    mirroring curate_documents' min-id survivor contract). Pass
    `return_verdicts=True` for the full per-clip verdict Dataset
    instead (every clip, keep flag + fixed-order reasons)."""
    from ..stages.dedup import dedup_exact

    verdicts = ds.map_batches(AudioCurationStage,
                              fn_constructor_kwargs=stage_kwargs,
                              batch_size=batch_size,
                              batch_format="pyarrow",
                              concurrency=concurrency)
    if return_verdicts:
        return verdicts

    def kept(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(t["keep"], False)) \
            .select(["fp", "clip_id"])

    return dedup_exact(verdicts.map_batches(kept, batch_format="pyarrow"),
                       "fp", "clip_id")
