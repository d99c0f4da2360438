"""Lance-fragment resume wiring behind the sources.io seam.

pylance is not installable in this container, so the Lance side of the seam
is driven by a FAKE lance module (fragment ids backed by parquet shards):
list_fragments emits "fragment:<id>" units, read_fragments scans them with
an injected fragment_reader in remote tasks, and the manifest commits
fragment ids. Only the reader import differs from a real Lance deployment —
the partitioning, manifest, and resume logic is the code under test.
"""

import json
import os
from types import SimpleNamespace

import pytest


def _make_fake_lance_dataset(tmp_path, n_rows=2000, rows_per_file=500):
    """Parquet shards laid out as fake Lance fragments:
    <root>/data/frag-<i>.parquet plus a _versions dir so is_lance_path
    triggers."""
    from gojsonschema_ray.datagen import write_clips_parquet

    root = str(tmp_path / "clips.lance")
    staging = str(tmp_path / "staging")
    write_clips_parquet(staging, n_rows, audio_cap_ms=20,
                        rows_per_file=rows_per_file)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "_versions"))
    shards = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    for i, f in enumerate(shards):
        os.rename(os.path.join(staging, f),
                  os.path.join(root, "data", f"frag-{i}.parquet"))
    return root, len(shards)


def test_lance_fragment_resume(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq
    import ray.data as rd

    from gojsonschema_ray.sources import io
    from gojsonschema_ray.pipelines.flagship import run_flagship

    root, n_frags = _make_fake_lance_dataset(tmp_path)
    out = str(tmp_path / "out")

    def frag_file(path, fid):
        return os.path.join(path, "data", f"frag-{fid}.parquet")

    class FakeLanceDataset:
        def __init__(self, path):
            self.path = path

        def get_fragments(self):
            n = len(os.listdir(os.path.join(self.path, "data")))
            return [SimpleNamespace(fragment_id=i) for i in range(n)]

    monkeypatch.setattr(io, "HAVE_LANCE", True)
    monkeypatch.setattr(io, "lance",
                        SimpleNamespace(dataset=FakeLanceDataset))
    # the global uniqueness pass reads the whole "Lance" table via the
    # dataset reader; the fake delegates to parquet
    real_read_table = io.read_table
    monkeypatch.setattr(
        io, "read_table",
        lambda path, columns=None, **kw: rd.read_parquet(
            os.path.join(path, "data"), columns=columns)
        if io.is_lance_path(str(path)) else real_read_table(path, columns, **kw))

    # injected per-fragment scan/count (cloudpickled by value into tasks)
    def reader(path, fid, columns):
        import pyarrow.parquet as _pq

        return _pq.read_table(
            os.path.join(path, "data", f"frag-{fid}.parquet"), columns=columns)

    def counter(path, fid):
        return pq.read_metadata(frag_file(path, fid)).num_rows

    frags = io.list_fragments(root)
    assert frags == [f"fragment:{i}" for i in range(n_frags)]

    s1 = run_flagship(root, out, files_per_partition=2, audio_concurrency=2,
                      audio_cap_ms=20, fragment_reader=reader,
                      fragment_counter=counter)
    assert s1["rows"] == 2000
    assert s1["partitions"] == n_frags // 2 + 1  # data partitions + __global__

    manifest_path = os.path.join(out, "manifest.jsonl")
    lines = [json.loads(ln) for ln in open(manifest_path) if ln.strip()]
    data_lines = [ln for ln in lines if ln["partition"] != "__global__"]
    assert all(f.startswith("fragment:")
               for ln in data_lines for f in ln["fragments"])

    # resume: everything committed -> second run rewrites nothing
    before = open(manifest_path).read()
    s2 = run_flagship(root, out, files_per_partition=2, audio_concurrency=2,
                      audio_cap_ms=20, fragment_reader=reader,
                      fragment_counter=counter)
    assert open(manifest_path).read() == before
    assert s2["rows"] == s1["rows"] and s2["violations"] == s1["violations"]


def test_read_fragments_requires_reader_without_lance(ray_session, tmp_path):
    """Without pylance and without an injected reader, fragment ids fail
    loudly instead of being fed to the parquet reader."""
    from gojsonschema_ray.sources import io

    if io.HAVE_LANCE:  # pragma: no cover - container has no pylance
        pytest.skip("real pylance present")
    with pytest.raises(RuntimeError, match="pylance"):
        io.read_fragments(str(tmp_path), ["fragment:0"], columns=["clip_id"])
