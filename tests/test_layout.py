"""Z-order clustered layout: exact Morton algebra, stats-manifest file
pruning, and box-query correctness."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gojsonschema_ray.stages.layout import (ZOrderedReader, quantize_u16,
                                            write_zordered, zorder_key)


def _ref_interleave(vals: list[int], bits: int) -> int:
    out = 0
    k = len(vals)
    for i, v in enumerate(vals):          # col 0 = most significant lane
        for b in range(bits):
            out |= ((v >> b) & 1) << (k * b + (k - 1 - i))
    return out


def test_zorder_key_exact():
    rng = np.random.default_rng(43)
    for k in (2, 3):
        cols = [rng.integers(0, 1 << 16, 200) for _ in range(k)]
        got = zorder_key(cols, bits=16)
        want = [_ref_interleave([int(c[i]) for c in cols], 16)
                for i in range(200)]
        assert got.tolist() == want
    # 8-bit variant and guards
    a = np.array([0, 255, 7]); b = np.array([255, 0, 9])
    assert zorder_key([a, b], bits=8).tolist() == \
        [_ref_interleave([x, y], 8) for x, y in zip(a.tolist(), b.tolist())]
    with pytest.raises(ValueError, match="outside"):
        zorder_key([np.array([256]), np.array([0])], bits=8)
    with pytest.raises(ValueError, match="columns"):
        zorder_key([a], bits=8)
    # locality sanity: nearby points share high bits more than far ones
    z00 = zorder_key([np.array([3]), np.array([3])])[0]
    z01 = zorder_key([np.array([3]), np.array([4])])[0]
    zff = zorder_key([np.array([60000]), np.array([60000])])[0]
    assert abs(int(z01) - int(z00)) < abs(int(zff) - int(z00))


def test_quantize_u16():
    x = np.array([0.0, 0.5, 1.0, np.nan, -5.0, 7.0])
    q = quantize_u16(x, 0.0, 1.0, bits=8)
    assert q[0] == 0 and q[2] == 255 and q[1] == 127
    assert q[3] == 0 and q[4] == 0 and q[5] == 255  # nan/out-of-range clip
    assert (quantize_u16(x, 2.0, 2.0) == 0).all()   # degenerate range


def test_write_zordered_box_pruning(ray_session, tmp_path):
    """A clustered layout answers a box query exactly AND prunes most
    buckets; a narrow box on either single column also prunes."""
    rng = np.random.default_rng(47)
    n = 30_000
    df = pd.DataFrame({
        "x": rng.uniform(0, 100, n),
        "y": rng.uniform(0, 100, n),
        "payload": np.arange(n, dtype=np.int64),
    })
    d = str(tmp_path / "zlay")
    write_zordered(rd.from_pandas(df).repartition(6), ["x", "y"], d,
                   n_buckets=32)
    r = ZOrderedReader(d)
    assert r.last_total > 16  # cutpoints resolved to real buckets
    box = {"x": (10.0, 25.0), "y": (60.0, 75.0)}
    got = r.read_box(box).to_pandas().sort_values("payload") \
        .reset_index(drop=True)
    want = df[(df.x >= 10) & (df.x <= 25) & (df.y >= 60) & (df.y <= 75)] \
        .sort_values("payload").reset_index(drop=True)
    assert got["payload"].tolist() == want["payload"].tolist()
    assert r.last_scan < r.last_total / 2  # real pruning, not a rescan
    # single-column slices prune too (the point of multi-dim clustering)
    for c in ("x", "y"):
        out = r.read_box({c: (0.0, 12.0)}).to_pandas()
        assert len(out) == int((df[c] <= 12.0).sum())
        assert r.last_scan < r.last_total
    # empty box → empty result, zero buckets
    assert r.read_box({"x": (200.0, 300.0)}).to_pandas().empty
    assert r.last_scan == 0
    with pytest.raises(KeyError, match="clustered"):
        r.read_box({"payload": (0, 1)})
    with pytest.raises(ValueError, match="reserved"):
        write_zordered(rd.from_pandas(df.rename(columns={"x": "zkey"})),
                       ["zkey", "y"], d)
