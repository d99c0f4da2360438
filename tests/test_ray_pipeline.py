"""End-to-end Ray Data pipeline tests (single shared Ray session)."""

import collections
import os

import pytest

from gojsonschema_ray import datagen

N = 6_000


@pytest.fixture(scope="module")
def clips_pq(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    datagen.write_clips_parquet(str(d), N, audio_cap_ms=30, rows_per_file=1500)
    return str(d)


def test_uniqueness_golden(ray_session, clips_pq):
    import ray.data as rd

    from gojsonschema_ray.stages.uniqueness import duplicate_keys

    ds = rd.read_parquet(clips_pq, columns=["clip_id"])
    dups = {r["clip_id"]: r["n_rows"] for r in duplicate_keys(ds, "clip_id").take_all()}

    golden = collections.Counter(
        datagen.row_meta(i)["clip_id"] for i in range(N)
    )
    golden_dups = {k: v for k, v in golden.items() if v > 1}
    assert dups == golden_dups
    assert "clip-hot" in dups and dups["clip-hot"] == N // 1000


def test_column_stats_pipeline(ray_session, clips_pq):
    import ray.data as rd

    from gojsonschema_ray.stages.sketches import column_stats

    ds = rd.read_parquet(clips_pq, columns=["sr_hz", "dur_ms", "transcript"])
    stats = column_stats(ds, ["sr_hz", "dur_ms", "transcript"])
    assert stats["sr_hz"]["count"] == N
    assert stats["sr_hz"]["min"] == 7000
    assert stats["sr_hz"]["max"] == 48000
    assert abs(stats["sr_hz"]["approx_distinct"] - 6) <= 1
    n_null = sum(1 for i in range(N) if i % 967 == 0 and i % 971 != 0)
    assert stats["transcript"]["nulls"] == n_null
    assert 0 <= stats["dur_ms"]["p50"] <= 3_600_001


def test_drift_detection(ray_session, clips_pq, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from gojsonschema_ray.stages.drift import drift_report

    drift_dir = tmp_path / "drift"
    drift_dir.mkdir()
    pq.write_table(datagen.drift_table(N), str(drift_dir / "part-0.parquet"))

    ref = rd.read_parquet(clips_pq, columns=["sr_hz", "dur_ms"])
    new = rd.read_parquet(str(drift_dir), columns=["sr_hz", "dur_ms"])
    rep = drift_report(ref, new, ["sr_hz", "dur_ms"])
    assert rep["sr_hz"]["drifted"] is True
    assert rep["dur_ms"]["drifted"] is True
    # no self-drift
    rep_same = drift_report(ref, ref, ["sr_hz"])
    assert rep_same["sr_hz"]["drifted"] is False


def test_referential_integrity(ray_session, clips_pq, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from gojsonschema_ray.stages.integrity import referential_violations

    # reference side: all clip_ids except two known ones
    all_ids = sorted({datagen.row_meta(i)["clip_id"] for i in range(N)})
    missing = {all_ids[10], all_ids[100]}
    ref_tbl = pa.table({"clip_id": [c for c in all_ids if c not in missing]})
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    pq.write_table(ref_tbl, str(ref_dir / "ref.parquet"))

    ds = rd.read_parquet(clips_pq, columns=["clip_id"])
    ref_ds = rd.read_parquet(str(ref_dir))
    viol = referential_violations(ds, "clip_id", ref_ds, "clip_id", "transcripts")
    got = {r["key"] for r in viol.take_all()}
    assert got == missing


def test_flagship_resume(ray_session, clips_pq, tmp_path):
    from gojsonschema_ray.pipelines.flagship import run_flagship
    from gojsonschema_ray.state.manifest import Manifest

    out = str(tmp_path / "out")
    summary = run_flagship(clips_pq, out, with_audio=False, files_per_partition=2)
    assert summary["partitions"] == 3  # 2 file-partitions + __global__
    assert summary["violations"] > 0

    # resume: drop one partition from the manifest, rerun → only that one redone
    mpath = os.path.join(out, "manifest.jsonl")
    lines = open(mpath).read().strip().split("\n")
    import json

    kept = [l for l in lines if json.loads(l)["partition"] != "part-000001"]
    open(mpath, "w").write("\n".join(kept) + "\n")
    m_before = Manifest(mpath)
    assert not m_before.is_committed("part-000001")
    summary2 = run_flagship(clips_pq, out, with_audio=False, files_per_partition=2)
    assert summary2["partitions"] == 3
    assert summary2["violations"] == summary["violations"]


def test_wide_payload_batch_sizing(ray_session):
    """Wide binary rows (2 s clips ≈ 64 KB each): results are identical under
    native-block batches and small bounded batches — the knob that keeps
    batch x concurrency inside the worker heap for image/audio payloads."""
    from gojsonschema_ray import datagen
    from gojsonschema_ray.pipelines.flagship import validate_clips
    from gojsonschema_ray.util import collect_rows

    ds = datagen.clips_dataset(1200, audio_cap_ms=2000, override_num_blocks=4)
    counts = {}
    for bs in (None, 64):
        viol = validate_clips(ds, with_audio=True, with_uniqueness=False,
                              audio_batch_size=bs, audio_cap_ms=2000)
        rows = collect_rows(viol)
        counts[bs] = sorted((r["key"], r["keyword"]) for r in rows)
    assert counts[None] == counts[64]
    assert len(counts[None]) > 0  # injected violations present


def test_flagship_metadata_only_no_spurious_required(ray_session, tmp_path):
    """with_audio=False reads no `bytes` column; the ruleset must not flag
    every row as missing it (review regression)."""
    from gojsonschema_ray import datagen
    from gojsonschema_ray.pipelines.flagship import run_flagship
    from gojsonschema_ray.util import collect_rows
    import pyarrow.parquet as pq
    import ray.data as rd

    inp = str(tmp_path / "clips")
    datagen.write_clips_parquet(inp, 2000, audio_cap_ms=20, rows_per_file=1000)
    out = str(tmp_path / "out")
    s = run_flagship(inp, out, with_audio=False, files_per_partition=2)
    viol = rd.read_parquet(str(tmp_path / "out" / "violations" / "part-000000"))
    kws = {(r["keyword"], r["expected"]) for r in collect_rows(viol)}
    assert ("required", "required bytes") not in kws
    # metadata violations still present (injected enum/required/etc.)
    assert s["violations"] > 0


def test_flagship_clips_query_golden(ray_session):
    """End-to-end golden for the rows-only driver query `flagship_clips`
    (VERDICT r2 #10): per-keyword violation counts over the deterministic
    20k-row clips table, expected values computed CLOSED-FORM from the F1
    injection rules plus the documented checker contracts — never from
    engine output.

    Audio branch logic (datagen.clip_bytes + AudioInvariantChecker):
    - codec "mp3???" has no decoder entry -> decode;
    - truncated payloads (i%1013==0) cut the blob to 2/5: an odd surviving
      s16le byte count makes np.frombuffer raise -> decode, an even short
      read -> pcm_length (wav rows subtract the 44-byte header first);
    - duplicate-id rows (i%997==0) carry row i-1's clip_id, so the checker
      compares against row i-1's reference transcript -> transcript
      violation unless that reference is itself null.
    """
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as M

    n, cap = 20_000, 30  # q_flagship_clips constants
    dec = pcm = tr = 0
    for i in range(n):
        meta = datagen.row_meta(i)
        sr, dur, codec = meta["sr_hz"], meta["dur_ms"], meta["codec"]
        nsamp = int(sr * min(dur, cap) / 1000)
        if codec.startswith("mp3"):
            dec += 1
            continue
        if i % 1013 == 0:
            if codec == "wav":
                avail = max(0, max(1, (44 + 2 * nsamp) * 2 // 5) - 44)
            else:
                avail = max(1, (2 * nsamp) * 2 // 5)
            if avail % 2 == 1:
                dec += 1
            else:
                pcm += 1
        if i % 1000 != 499 and i % 997 == 0 and i > 0 \
                and ((i - 1) % 967 != 0 or (i - 1) % 971 == 0):
            tr += 1
    golden = {
        "enum": sum(1 for i in range(n) if i % 991 == 0)
        + sum(1 for i in range(n) if i % 977 == 0),
        "number_gt": sum(1 for i in range(n) if i % 983 == 0),
        "number_lte": sum(1 for i in range(n) if i % 1009 == 0 and i % 983 != 0),
        "string_gte": sum(1 for i in range(n) if i % 971 == 0),
        "required": sum(1 for i in range(n) if i % 967 == 0 and i % 971 != 0),
        "unique": sum(1 for v in collections.Counter(
            datagen.row_meta(i)["clip_id"] for i in range(n)).values() if v > 1),
        "decode": dec,
        "pcm_length": pcm,
        "transcript": tr,
    }
    df = M.queries()["flagship_clips"]("/root/testdata/sf0.01")
    got = dict(zip(df["keyword"], df["n"]))
    assert got == golden


def test_drift_events_query_golden(ray_session):
    """Bound-based golden for the rows-only driver query `drift_events`
    (VERDICT r2 #10): the t-digest bin edges are engine state, so instead of
    freezing them the test checks the digest-binned KS/PSI against an
    EXACT numpy recomputation of the same first-half/second-half split.
    Binned KS underestimates exact KS by at most the largest bin mass, so a
    0.05 agreement band is a real regression guard (sign errors, off-by-one
    edge handling, split drift all land far outside it)."""
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as M

    sf = "/root/testdata/sf0.01"
    df = M.queries()["drift_events"](sf)
    assert list(df["column"]) == ["value"]

    ev = pq.read_table(os.path.join(sf, "events.parquet"),
                       columns=["ts", "value"]).to_pandas()
    lo, hi = ev["ts"].min(), ev["ts"].max()
    mid = lo + (hi - lo) / 2
    a = ev.loc[ev["ts"] < mid, "value"].to_numpy()
    b = ev.loc[ev["ts"] >= mid, "value"].to_numpy()
    # exact two-sample KS
    allv = np.sort(np.unique(np.concatenate([a, b])))
    ca = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    ks_exact = float(np.abs(ca - cb).max())
    got = float(df["ks"][0])
    assert abs(got - ks_exact) <= 0.05, (got, ks_exact)
    assert float(df["psi"][0]) >= 0.0
    assert bool(df["drifted"][0]) == (ks_exact > 0.1 or float(df["psi"][0]) > 0.2)
