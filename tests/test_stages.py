"""Stage tests over the deterministic clips table: golden expectations are
computed from the F1 injection rules (closed-form row index sets), never from
the engine itself."""

import numpy as np
import pyarrow as pa
import pytest

from gojsonschema_ray import datagen
from gojsonschema_ray.schema import compile_schema
from gojsonschema_ray.pipelines.flagship import DEFAULT_RULESET
from gojsonschema_ray.stages.audio import AudioInvariantChecker
from gojsonschema_ray.stages.sketches import ColumnStats, HyperLogLog, TDigest
from gojsonschema_ray.stages.validate import TableValidator

N = 10_000


@pytest.fixture(scope="module")
def clips():
    return datagen.clips_table(N, audio_cap_ms=40)


def test_schema_violations_golden(clips):
    tree = compile_schema(DEFAULT_RULESET)
    tv = TableValidator(tree, key_column="clip_id", mode="violations")
    viol = tv(clips)
    kw = viol["keyword"].to_pylist()
    # golden closed-form counts
    n_sr = sum(1 for i in range(N) if i % 991 == 0)           # enum sr_hz
    n_dur0 = sum(1 for i in range(N) if i % 983 == 0)         # exclusiveMinimum
    n_durmax = sum(1 for i in range(N) if i % 1009 == 0 and i % 983 != 0)
    n_codec = sum(1 for i in range(N) if i % 977 == 0)        # enum codec
    n_empty = sum(1 for i in range(N) if i % 971 == 0)        # minLength
    n_null = sum(1 for i in range(N) if i % 967 == 0 and i % 971 != 0)  # required
    assert kw.count("enum") == n_sr + n_codec
    assert kw.count("number_gt") == n_dur0
    assert kw.count("number_lte") == n_durmax
    assert kw.count("string_gte") == n_empty
    assert kw.count("required") == n_null
    # hot-key rows still match the clip_id pattern; no pattern violations
    assert kw.count("pattern") == 0


def test_audio_checker_golden(clips):
    checker = AudioInvariantChecker(audio_cap_ms=40)
    viol = checker(clips.slice(0, 3000))
    kws = viol["keyword"].to_pylist()
    keys = viol["key"].to_pylist()
    # truncated payloads: i % 1013 == 0 → decode (wav) or pcm_length (raw)
    truncated = [i for i in range(3000) if i % 1013 == 0]
    bad_codec = [i for i in range(3000) if i % 977 == 0]
    got_decode = {k for k, w in zip(keys, kws) if w in ("decode", "pcm_length")}
    for i in truncated:
        cid = datagen.row_meta(i)["clip_id"]
        assert cid in got_decode, f"row {i} truncated but not flagged"
    # invalid codec rows flagged as decode violations
    for i in bad_codec:
        cid = datagen.row_meta(i)["clip_id"]
        assert cid in got_decode
    # SNR violations should not fire on intact sine rows
    snr_keys = {k for k, w in zip(keys, kws) if w == "snr"}
    intact = datagen.row_meta(4)["clip_id"]
    assert intact not in snr_keys


def test_snr_catches_corrupted_pcm():
    from gojsonschema_ray.stages.audio import best_fit_sine_snr

    sr = 16000
    t = np.arange(sr // 2) / sr
    pure = (0.5 * np.sin(2 * np.pi * 250 * t) * 32767).astype(np.int16)
    assert best_fit_sine_snr(pure, sr) >= 30
    rng_free_noise = ((np.arange(len(t)) * 2654435761 % 65536) - 32768).astype(np.int16)
    assert best_fit_sine_snr(rng_free_noise, sr) < 30


def test_tdigest_quantiles():
    d = TDigest()
    vals = np.arange(100_000, dtype=np.float64)
    for chunk in np.array_split(vals, 13):
        d.add_array(chunk)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        assert abs(d.quantile(q) - q * 100_000) < 1500, q
    # merge associativity
    d2 = TDigest()
    d2.add_array(vals[:50_000])
    d3 = TDigest()
    d3.add_array(vals[50_000:])
    d2.merge(d3)
    assert abs(d2.quantile(0.5) - 50_000) < 1500


def test_hll_cardinality():
    h = HyperLogLog()
    arr = pa.array([f"key-{i}" for i in range(200_000)])
    h.add_array(arr)
    est = h.cardinality()
    assert abs(est - 200_000) / 200_000 < 0.03
    # merge
    h2 = HyperLogLog()
    h2.add_array(pa.array([f"key-{i}" for i in range(150_000, 250_000)]))
    h.merge(h2)
    assert abs(h.cardinality() - 250_000) / 250_000 < 0.03


def test_column_stats_exact_fields(clips):
    st = ColumnStats("sr_hz", numeric=True)
    st.add(clips["sr_hz"])
    s = st.summary()
    assert s["count"] == N and s["nulls"] == 0
    assert s["min"] == 7000.0 and s["max"] == 48000.0
    st2 = ColumnStats("transcript", numeric=False)
    st2.add(clips["transcript"])
    s2 = st2.summary()
    assert s2["nulls"] == sum(1 for i in range(N) if i % 967 == 0 and i % 971 != 0)
