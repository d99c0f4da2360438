"""G.711 mu-law / A-law codec: bit-exactness, round-trip bounds, and
stage integration (telephony clips flowing through the shared decoder
table and the transcode path of AudioTransformStage).

Exactness mirrors the reference's byte-for-byte validation discipline
(/root/reference/validation.go): every kernel is pinned against
CPython's audioop C implementation over the FULL input domain when the
module is importable (Python <= 3.12), with closed-form fallbacks."""
import numpy as np
import pytest

from gojsonschema_ray.functions import g711

try:  # removed in Python 3.13 — closed-form assertions still run
    import audioop
except ImportError:  # pragma: no cover
    audioop = None

ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_audioop_parity_full_domain():
    for enc, dec, lin2, law2 in [
        (g711.ulaw_encode, g711.ulaw_decode,
         audioop.lin2ulaw, audioop.ulaw2lin),
        (g711.alaw_encode, g711.alaw_decode,
         audioop.lin2alaw, audioop.alaw2lin),
    ]:
        ref = np.frombuffer(lin2(ALL_I16.tobytes(), 2), dtype=np.uint8)
        assert np.array_equal(enc(ALL_I16), ref)
        refd = np.frombuffer(law2(ALL_CODES.tobytes(), 2), dtype=np.int16)
        assert np.array_equal(dec(ALL_CODES), refd)


def test_round_trip_bounds_and_idempotence():
    # quantization error never exceeds the top-segment half-step
    # (measured exact maxima over all 65536 inputs; clip region included)
    rt = g711.ulaw_decode(g711.ulaw_encode(ALL_I16)).astype(np.int32)
    assert int(np.max(np.abs(rt - ALL_I16))) == 644
    rt = g711.alaw_decode(g711.alaw_encode(ALL_I16)).astype(np.int32)
    assert int(np.max(np.abs(rt - ALL_I16))) == 512
    # codebook values are fixed points of decode->encode->decode
    for enc, dec in [(g711.ulaw_encode, g711.ulaw_decode),
                     (g711.alaw_encode, g711.alaw_decode)]:
        v = dec(ALL_CODES)
        assert np.array_equal(dec(enc(v)), v)
    # A-law codes are fully idempotent; mu-law's sole exception is
    # negative zero 0x7F (re-encodes as positive zero 0xFF)
    codes = g711.alaw_encode(g711.alaw_decode(ALL_CODES))
    assert np.array_equal(codes, ALL_CODES)
    codes = g711.ulaw_encode(g711.ulaw_decode(ALL_CODES))
    (bad,) = np.flatnonzero(codes != ALL_CODES)
    assert bad == 0x7F and codes[bad] == 0xFF


def test_decoder_adapters_and_known_values():
    pcm = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    blob = g711.ulaw_encode(pcm).tobytes()
    out, sr = g711.decode_ulaw(blob, 8000)
    assert sr == 8000 and out.dtype == np.int16 and len(out) == 5
    # silence encodes to 0xFF (mu) / 0xD5 (A) — the classic line-idle bytes
    z = np.zeros(4, dtype=np.int16)
    assert g711.ulaw_encode(z).tolist() == [0xFF] * 4
    assert g711.alaw_encode(z).tolist() == [0xD5] * 4


def test_g711_clips_flow_through_stages(ray_session):
    """ulaw/alaw clips decode inside the shared decoder table: feature
    extraction sees the (quantized) sine and transcode re-emits
    pcm_s16le; target_codec='ulaw' re-encodes bit-exactly."""
    import pyarrow as pa
    import ray

    from gojsonschema_ray.stages.audio import (AudioFeatureStage,
                                               AudioTransformStage)
    from gojsonschema_ray.util import collect_rows

    sr, n = 8000, 8000
    tone = np.rint(0.4 * 32767 * np.sin(
        2 * np.pi * 440 * np.arange(n) / sr)).astype(np.int16)
    tbl = pa.table({
        "clip_id": ["u1", "a1", "p1"],
        "bytes": [g711.ulaw_encode(tone).tobytes(),
                  g711.alaw_encode(tone).tobytes(),
                  tone.tobytes()],
        "sr_hz": pa.array([sr] * 3, pa.int32()),
        "dur_ms": pa.array([1000] * 3, pa.int32()),
        "codec": ["ulaw", "alaw", "pcm_s16le"],
        "transcript": ["", "", ""],
    })
    ds = ray.data.from_arrow(tbl)
    feats = {r["clip_id"]: r for r in collect_rows(ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=(1, 1)))}
    assert all(feats[k]["decode_ok"] for k in ("u1", "a1", "p1"))
    # companding is ~6-bit quantization of a 0.4 FS sine: peak frequency
    # survives exactly, RMS within 1%
    for k in ("u1", "a1"):
        assert abs(feats[k]["est_freq_hz"] - 440.0) < 2.0
        assert abs(feats[k]["rms_dbfs"] - feats["p1"]["rms_dbfs"]) < 0.1

    out = {r["clip_id"]: r for r in collect_rows(ds.map_batches(
        AudioTransformStage, fn_constructor_kwargs=dict(target_codec="ulaw"),
        batch_format="pyarrow", concurrency=(1, 1)))}
    assert out["p1"]["codec"] == "ulaw"
    got = np.frombuffer(out["p1"]["bytes"], dtype=np.uint8)
    assert np.array_equal(got, g711.ulaw_encode(tone))
    # and the ulaw input comes back as its exact codebook PCM when
    # transcoded to linear
    lin = {r["clip_id"]: r for r in collect_rows(ds.map_batches(
        AudioTransformStage, batch_format="pyarrow", concurrency=(1, 1)))}
    assert np.array_equal(
        np.frombuffer(lin["u1"]["bytes"], dtype="<i2"),
        g711.ulaw_decode(g711.ulaw_encode(tone)))


def test_transform_stage_rejects_bad_codec():
    from gojsonschema_ray.stages.audio import AudioTransformStage

    with pytest.raises(ValueError, match="target_codec"):
        AudioTransformStage(target_codec="mp3")
