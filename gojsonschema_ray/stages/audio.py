"""PCM-level invariant checks on the audio `bytes` column — the reference's
`format` checker generalized to binary payloads (SURVEY.md §2.6; BASELINE.json
input_hint: "decoded-PCM allclose (SNR>=30dB) + transcript equality").

Runs as a STATEFUL ACTOR POOL:
    ds.map_batches(AudioInvariantChecker, concurrency=N, batch_size=64-256,
                   num_cpus=1, batch_format="pyarrow")
Decoder state (codec dispatch table, scratch buffers) is built once per actor
in __init__ (the reference's compile-once pattern, README.md:126-136); each
__call__ handles one small batch (audio rows are wide — small batch_size keeps
batch × concurrency inside the worker heap).

Checks per row:
- decode:      bytes parse under the declared codec (wav container / raw s16le)
- pcm_length:  decoded sample count == sr_hz * min(dur_ms, cap)/1000
- snr:         >= 30 dB against the best-fit single sine (least-squares fit at
               the FFT-peak frequency, refined by local search) — the
               "reference decode" invariant for synthetic sine corpora
- transcript:  byte-equality against the reference transcript when the clip_id
               encodes the generator row index (clip-<i>)

True codec work (mp3/opus/flac) needs external libs not present in this
container; those codecs raise CodecUnavailable and are emitted as `decode`
violations with expected="decodable codec" — the Ray-side plumbing (schema,
actor signature, batch sizing, violation layout) is real and tested.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa


class CodecUnavailable(Exception):
    pass


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(blob), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected mono s16")
    return np.frombuffer(raw, dtype="<i2"), sr


def decode_raw_s16le(blob: bytes, sr: int) -> tuple[np.ndarray, int]:
    if len(blob) % 2 != 0:
        raise ValueError("odd byte count for s16le payload")
    return np.frombuffer(blob, dtype="<i2"), sr


_HANNING_CACHE: dict[int, np.ndarray] = {}
_PAD_CACHE: dict[int, np.ndarray] = {}
_SCRATCH: dict[tuple, tuple] = {}
_IDX_CACHE: dict[int, np.ndarray] = {}


def _hanning(n: int) -> np.ndarray:
    w = _HANNING_CACHE.get(n)
    if w is None:
        w = np.hanning(n).astype(np.float32)
        _HANNING_CACHE[n] = w
    return w


def _pad_buf(nfft: int) -> np.ndarray:
    b = _PAD_CACHE.get(nfft)
    if b is None:
        b = np.zeros(nfft, np.float32)
        _PAD_CACHE[nfft] = b
    return b


def _idx(n: int) -> np.ndarray:
    i = _IDX_CACHE.get(n)
    if i is None:
        i = np.arange(n, dtype=np.float32)
        _IDX_CACHE[n] = i
    return i


def _scratch(m: int, n: int) -> tuple:
    # per-worker reusable (W, S, C) float32 buffers — this VM's first-touch
    # page faults make fresh temporaries expensive (BASELINE.md note 7), and
    # the sin/cos basis is the bandwidth hot spot of the audio pass
    key = (m, n)
    s = _SCRATCH.get(key)
    if s is None:
        s = (np.empty((m, n), np.float32), np.empty((m, n), np.float32),
             np.empty((m, n), np.float32))
        if len(_SCRATCH) < 64:
            _SCRATCH[key] = s
    return s


def _peak_frequency(xf: np.ndarray, sr: int) -> float:
    """FFT-peak frequency of a (mean-removed float) signal: 4x zero-padded
    Hann spectrum argmax + parabolic interpolation on the mainlobe — the
    same estimator best_fit_sine_snr seeds its least-squares fit with.

    float32 throughout (half the FFT bandwidth of float64): magnitude
    argmax + a 3-point parabola need nowhere near float64 precision."""
    n = len(xf)
    nfft = 1 << max(12, int(np.ceil(np.log2(4 * n))))
    buf = _pad_buf(nfft)
    np.multiply(xf, _hanning(n), out=buf[:n])
    buf[n:] = 0
    spec = np.abs(np.fft.rfft(buf))
    k = int(np.argmax(spec[1:])) + 1
    if 1 <= k < len(spec) - 1:
        a, b, c = (float(spec[k - 1]), float(spec[k]), float(spec[k + 1]))
        denom = a - 2 * b + c
        delta = 0.5 * (a - c) / denom if denom != 0 else 0.0
        delta = float(np.clip(delta, -0.5, 0.5))
    else:
        delta = 0.0
    return (k + delta) * sr / nfft


def best_fit_sine_snr(x: np.ndarray, sr: int) -> float:
    """SNR (dB) of x against its least-squares best single-sine fit.

    Frequency from a ZERO-PADDED FFT peak (4x padding + parabolic
    interpolation on the smooth window mainlobe gives the frequency to a
    small fraction of a bin), then closed-form [sin, cos, 1] least-squares
    fits at the estimate ±δ. This replaces a 15-candidate basis search with
    3 candidates — the sin/cos basis evaluation is the memory+compute hot
    spot of the whole audio pass, and cutting it 5x is what lets 32 cores
    scale (the wide search was memory-bandwidth-bound). A pure sine scores
    very high; a corrupted or non-sinusoidal payload scores low."""
    n = len(x)
    if n < 16:
        return -np.inf
    # float32 signal/basis with float64 solve: the sin/cos basis is the
    # memory-bandwidth hot spot of the whole audio pass and float32 halves
    # it. Precision floor: float32 phase error ~eps*|w| caps measurable SNR
    # near ~67 dB — far above the 30 dB threshold, far below the scores of
    # corrupted payloads, so verdicts are unchanged.
    xf = x.astype(np.float32)
    xf -= np.float32(x.mean(dtype=np.float64))
    nfft = 1 << max(12, int(np.ceil(np.log2(4 * n))))
    freq = _peak_frequency(xf, sr)
    pad_res = sr / nfft

    def snr_batch(freqs: np.ndarray) -> np.ndarray:
        """Closed-form least-squares sine fit per candidate frequency:
        basis [sin, cos, 1], 3x3 normal equations solved in a stack —
        O(n) per candidate, no SVD; all (m, n) work in reused float32
        scratch buffers, in place."""
        m = len(freqs)
        W, S, C = _scratch(m, n)
        np.multiply((2 * np.pi / sr * freqs).astype(np.float32)[:, None],
                    _idx(n)[None, :], out=W)
        np.sin(W, out=S)
        np.cos(W, out=C)
        G = np.empty((m, 3, 3))
        G[:, 0, 0] = np.einsum("ij,ij->i", S, S)
        G[:, 0, 1] = G[:, 1, 0] = np.einsum("ij,ij->i", S, C)
        G[:, 0, 2] = G[:, 2, 0] = S.sum(1)
        G[:, 1, 1] = np.einsum("ij,ij->i", C, C)
        G[:, 1, 2] = G[:, 2, 1] = C.sum(1)
        G[:, 2, 2] = n
        b = np.stack([S @ xf, C @ xf,
                      np.full(m, xf.sum(dtype=np.float64))], axis=1) \
            .astype(np.float64)
        try:
            coef = np.linalg.solve(G, b[..., None])[..., 0]
        except np.linalg.LinAlgError:
            coef = np.stack([np.linalg.lstsq(G[i], b[i], rcond=None)[0]
                             for i in range(m)])
        energy = float(np.einsum("i,i->", xf, xf, dtype=np.float64))
        fit_energy = (coef * b).sum(1)
        noise = np.maximum(energy - fit_energy, 0.0)
        with np.errstate(divide="ignore"):
            return 10 * np.log10(np.maximum(fit_energy, 1e-30)
                                 / np.maximum(noise, 1e-30))

    # the padded-FFT estimate is accurate to ~pad_res/10; bracket it and,
    # if the generator used an integral frequency, try that exactly too
    cands = [freq - 0.3 * pad_res, freq, freq + 0.3 * pad_res]
    r = round(freq)
    if abs(freq - r) < 2 * pad_res:
        cands.append(float(r))
    return float(snr_batch(np.unique(np.array(cands))).max())


def reference_transcript(i: int) -> str | None:
    from ..datagen import row_meta

    return row_meta(i)["transcript"]


class AudioInvariantChecker:
    """Actor-pool map_batches payload emitting violation rows (F4 schema)."""

    def __init__(self, snr_db: float = 30.0, audio_cap_ms: int = 50,
                 check_transcript: bool = True):
        self.snr_db = snr_db
        self.audio_cap_ms = audio_cap_ms
        self.check_transcript = check_transcript
        self.decoders = {
            "wav": lambda blob, sr: decode_wav(blob),
            "pcm_s16le": decode_raw_s16le,
        }

    def _check_row(self, clip_id, blob, sr, dur_ms, codec, transcript, out):
        dec = self.decoders.get(codec)
        if dec is None:
            out.append((clip_id, "decode", "(root).bytes",
                        "decodable codec", str(codec)))
            return
        try:
            pcm, file_sr = dec(blob, sr)
        except Exception as e:  # noqa: BLE001 — any decode failure is a violation
            out.append((clip_id, "decode", "(root).bytes",
                        f"{codec} decodes", type(e).__name__))
            return
        expected_n = int(sr * min(dur_ms, self.audio_cap_ms) / 1000) \
            if dur_ms is not None and sr is not None else None
        if expected_n is not None and len(pcm) != expected_n:
            out.append((clip_id, "pcm_length", "(root).bytes",
                        f"{expected_n} samples", f"{len(pcm)} samples"))
            return
        if len(pcm) >= 16:
            snr = best_fit_sine_snr(pcm, int(sr))
            if snr < self.snr_db:
                out.append((clip_id, "snr", "(root).bytes",
                            f">= {self.snr_db} dB", f"{snr:.1f} dB"))
        if self.check_transcript and isinstance(clip_id, str) \
                and clip_id.startswith("clip-") and clip_id[5:].isdigit():
            ref = reference_transcript(int(clip_id[5:]))
            if ref is not None and transcript != ref:
                out.append((clip_id, "transcript", "(root).transcript",
                            "reference transcript", "" if transcript is None
                            else transcript[:64]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_pylist()
        durs = batch["dur_ms"].to_pylist()
        codecs = batch["codec"].to_pylist()
        txts = batch["transcript"].to_pylist() if "transcript" in batch.column_names \
            else [None] * batch.num_rows
        out: list[tuple] = []
        for row in zip(ids, blobs, srs, durs, codecs, txts):
            if row[1] is None:
                out.append((row[0], "required", "(root).bytes", "required bytes", ""))
                continue
            self._check_row(*row, out)
        from .validate import VIOLATION_SCHEMA

        if not out:
            return VIOLATION_SCHEMA.empty_table()
        cols = list(zip(*out))
        return pa.table(
            [pa.array([str(c) if c is not None else "" for c in col])
             for col in cols],
            schema=VIOLATION_SCHEMA,
        )


_FS = 32767.0  # datagen encodes amplitude relative to int16 positive FS


def pcm_features(pcm: np.ndarray, sr: int) -> dict:
    """Per-clip audio features over decoded int16 PCM — the filter/bucket
    signals of a training-data audio pipeline (silence gating by RMS,
    clipping rejection, tone/voicing proxies). All numpy over the clip:
    one float64 copy, one rFFT; no sample-level Python.

    Returns rms_dbfs, peak_dbfs (dB re. int16 full scale), zcr_hz (zero
    crossings per second), spectral_centroid_hz (magnitude-weighted rFFT
    mean, DC excluded), clipped_frac (samples at |FS|), est_freq_hz (padded
    FFT peak — _peak_frequency)."""
    n = len(pcm)
    if n == 0:
        return {"n_samples": 0, "rms_dbfs": None, "peak_dbfs": None,
                "zcr_hz": None, "spectral_centroid_hz": None,
                "clipped_frac": None, "est_freq_hz": None}
    xf = pcm.astype(np.float64)
    rms = float(np.sqrt(np.mean(xf * xf)))
    peak = float(np.max(np.abs(xf)))
    with np.errstate(divide="ignore"):
        rms_dbfs = float(20 * np.log10(max(rms, 1e-12) / _FS))
        peak_dbfs = float(20 * np.log10(max(peak, 1e-12) / _FS))
    signs = np.signbit(xf)
    crossings = int(np.count_nonzero(signs[1:] != signs[:-1]))
    zcr_hz = crossings * sr / (2.0 * n)  # crossing pairs per second
    spec = np.abs(np.fft.rfft(xf - xf.mean()))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    mass = float(spec[1:].sum())
    centroid = float((freqs[1:] * spec[1:]).sum() / mass) if mass > 0 else 0.0
    # count on the float copy: np.abs over int16 would wrap at -32768
    clipped = int(np.count_nonzero(np.abs(xf) >= _FS))
    est = _peak_frequency(xf - xf.mean(), sr) if n >= 16 else None
    return {"n_samples": n, "rms_dbfs": rms_dbfs, "peak_dbfs": peak_dbfs,
            "zcr_hz": float(zcr_hz), "spectral_centroid_hz": centroid,
            "clipped_frac": clipped / n,
            "est_freq_hz": None if est is None else float(est)}


FEATURE_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("decode_ok", pa.bool_()),
    ("n_samples", pa.int64()),
    ("rms_dbfs", pa.float64()),
    ("peak_dbfs", pa.float64()),
    ("zcr_hz", pa.float64()),
    ("spectral_centroid_hz", pa.float64()),
    ("clipped_frac", pa.float64()),
    ("est_freq_hz", pa.float64()),
])


class AudioFeatureStage:
    """Actor-pool map_batches payload: decode + per-clip feature extraction.

    Same deployment shape as AudioInvariantChecker (stateful decode table in
    __init__, small batches — audio rows are wide); a row that fails to
    decode emits decode_ok=False with null features instead of failing the
    batch, so a corrupt shard degrades to filterable rows, not a dead task."""

    def __init__(self, audio_cap_ms: int | None = None):
        self.audio_cap_ms = audio_cap_ms
        self.decoders = {
            "wav": lambda blob, sr: decode_wav(blob),
            "pcm_s16le": decode_raw_s16le,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_pylist()
        codecs = batch["codec"].to_pylist()
        rows = []
        for cid, blob, sr, codec in zip(ids, blobs, srs, codecs):
            dec = self.decoders.get(codec)
            feat = None
            if dec is not None and blob is not None:
                try:
                    pcm, file_sr = dec(blob, sr)
                    feat = pcm_features(pcm, int(file_sr or sr))
                except Exception:  # noqa: BLE001 — any decode failure → row
                    feat = None
            if feat is None:
                rows.append({"clip_id": cid, "decode_ok": False,
                             "n_samples": None, "rms_dbfs": None,
                             "peak_dbfs": None, "zcr_hz": None,
                             "spectral_centroid_hz": None,
                             "clipped_frac": None, "est_freq_hz": None})
            else:
                rows.append({"clip_id": cid, "decode_ok": True, **feat})
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)
