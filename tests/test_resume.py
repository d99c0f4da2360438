"""Kill-resume: a run SIGKILLed mid-flight must resume from the last
committed partition without recomputing it (BASELINE.json north_rule), and
the final output must equal an uninterrupted run's."""

import json
import os
import signal
import subprocess
import sys
import time

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from gojsonschema_ray.pipelines.flagship import run_flagship
s = run_flagship({inp!r}, {out!r}, files_per_partition=1,
                 audio_concurrency=2, audio_cap_ms=20)
print("SUMMARY " + __import__("json").dumps(s))
ray.shutdown()
"""


def _spawn(repo, inp, out):
    return subprocess.Popen(
        [sys.executable, "-c", SCRIPT.format(repo=repo, inp=inp, out=out)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env={**os.environ, "PYTHONPATH": repo},
    )


# flagship over the FAKE Lance seam (fragment-id partitions, injected
# readers) — the Lance-deployment shape of SCRIPT above
LANCE_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from types import SimpleNamespace
from gojsonschema_ray.sources import io

class FakeLanceDataset:
    def __init__(self, path):
        self.path = path
    def get_fragments(self):
        n = len(os.listdir(os.path.join(self.path, "data")))
        return [SimpleNamespace(fragment_id=i) for i in range(n)]

io.HAVE_LANCE = True
io.lance = SimpleNamespace(dataset=FakeLanceDataset)
_real_read_table = io.read_table
def _rt(path, columns=None, **kw):
    if io.is_lance_path(str(path)):
        return rd.read_parquet(os.path.join(path, "data"), columns=columns)
    return _real_read_table(path, columns, **kw)
io.read_table = _rt

def reader(path, fid, columns):
    import pyarrow.parquet as pq
    return pq.read_table(
        os.path.join(path, "data", f"frag-{{fid}}.parquet"), columns=columns)
def counter(path, fid):
    import pyarrow.parquet as pq
    return pq.read_metadata(
        os.path.join(path, "data", f"frag-{{fid}}.parquet")).num_rows

from gojsonschema_ray.pipelines.flagship import run_flagship
s = run_flagship({root!r}, {out!r}, files_per_partition=1,
                 audio_concurrency=2, audio_cap_ms=20,
                 fragment_reader=reader, fragment_counter=counter)
print("SUMMARY " + __import__("json").dumps(s))
ray.shutdown()
"""


def _spawn_lance(repo, root, out):
    return subprocess.Popen(
        [sys.executable, "-c",
         LANCE_SCRIPT.format(repo=repo, root=root, out=out)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env={**os.environ, "PYTHONPATH": repo},
    )


def _wait_for_commits(manifest, proc, n, deadline_s=180):
    """Block until the manifest holds >= n committed lines (or proc dies)."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        if os.path.exists(manifest):
            lines = [ln for ln in open(manifest).read().splitlines()
                     if ln.strip()]
            if len(lines) >= n:
                return lines
        if proc.poll() is not None:
            break
        time.sleep(0.1)
    return None


def test_kill_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = str(tmp_path / "clips")
    out = str(tmp_path / "out")

    # generate input OUTSIDE the measured runs (serial writer, no Ray needed)
    sys.path.insert(0, repo)
    from gojsonschema_ray.datagen import write_clips_parquet

    write_clips_parquet(inp, 3000, audio_cap_ms=20, rows_per_file=1000)

    manifest = os.path.join(out, "manifest.jsonl")

    # run 1: SIGKILL as soon as the first partition commits
    p = _spawn(repo, inp, out)
    deadline = time.time() + 180
    first_commit = None
    while time.time() < deadline:
        if os.path.exists(manifest):
            lines = [ln for ln in open(manifest).read().splitlines() if ln.strip()]
            if lines:
                first_commit = json.loads(lines[0])
                break
        if p.poll() is not None:
            break
        time.sleep(0.1)
    assert first_commit is not None, "no partition committed before timeout"
    p.send_signal(signal.SIGKILL)
    p.wait()

    committed_after_kill = [
        json.loads(ln) for ln in open(manifest).read().splitlines() if ln.strip()
    ]
    n_committed = len(committed_after_kill)
    assert 1 <= n_committed < 4  # killed mid-run: __global__ never reached

    # run 2: resume — must NOT recompute committed partitions
    t0 = time.time()
    p2 = _spawn(repo, inp, out)
    out2, _ = p2.communicate(timeout=300)
    assert p2.returncode == 0, out2
    summary = json.loads([ln for ln in out2.splitlines()
                          if ln.startswith("SUMMARY ")][0][len("SUMMARY "):])
    assert summary["partitions"] == 4  # 3 data partitions + __global__
    assert summary["rows"] == 3000

    # the previously committed manifest lines are byte-identical (no rewrite,
    # no recompute) and still the FIRST lines of the resumed manifest
    final_lines = [ln for ln in open(manifest).read().splitlines() if ln.strip()]
    for i, rec in enumerate(committed_after_kill):
        assert json.loads(final_lines[i]) == rec

    # uninterrupted reference run in a fresh output dir agrees
    out_ref = str(tmp_path / "ref")
    p3 = _spawn(repo, inp, out_ref)
    out3, _ = p3.communicate(timeout=300)
    assert p3.returncode == 0, out3
    ref = json.loads([ln for ln in out3.splitlines()
                      if ln.startswith("SUMMARY ")][0][len("SUMMARY "):])
    assert ref["violations"] == summary["violations"]
    assert ref["rows"] == summary["rows"]


def test_cli_gen_and_validate(tmp_path):
    """python -m gojsonschema_ray gen/validate — the ray-job surface."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}
    clips = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    r1 = subprocess.run(
        [sys.executable, "-m", "gojsonschema_ray", "gen", "--out", clips,
         "--rows", "1500", "--cap-ms", "20", "--rows-per-file", "500"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=240)
    assert r1.returncode == 0, r1.stderr[-500:]
    assert json.loads(r1.stdout.strip().splitlines()[-1])["rows"] == 1500
    r2 = subprocess.run(
        [sys.executable, "-m", "gojsonschema_ray", "validate", "--input", clips,
         "--out", out, "--audio-concurrency", "2", "--audio-cap-ms", "20"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=240)
    assert r2.returncode == 0, r2.stderr[-500:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 1500 and summary["partitions"] >= 1
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))


def _commit_worker(path, wid, n):
    """Concurrent-writer child: its own Manifest handle, n commits."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gojsonschema_ray.state.manifest import Manifest

    m = Manifest(path)
    for i in range(n):
        m.commit(f"p{wid}-{i}", [f"fragment:{wid}:{i}"], rows=1, violations=0)


def test_manifest_concurrent_commits(tmp_path):
    """Several processes appending to ONE manifest concurrently (the
    multi-writer shape of a distributed run): O_APPEND line writes must not
    tear or interleave — every line parses, every commit survives."""
    import multiprocessing as mp

    path = str(tmp_path / "manifest.jsonl")
    ctx = mp.get_context("spawn")  # no inherited Ray state
    procs = [ctx.Process(target=_commit_worker, args=(path, w, 50))
             for w in range(6)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    assert len(lines) == 6 * 50
    recs = [json.loads(ln) for ln in lines]  # raises on any torn line
    assert len({r["partition"] for r in recs}) == 6 * 50

    from gojsonschema_ray.state.manifest import Manifest

    assert len(Manifest(path).committed) == 6 * 50


def test_lance_multi_kill_resume(tmp_path):
    """Fragment-partitioned flagship over the fake-Lance seam survives TWO
    successive SIGKILLs: each resume keeps the committed prefix
    byte-identical (no recomputation) and the final summary equals an
    uninterrupted run's."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from gojsonschema_ray.datagen import write_clips_parquet

    root = str(tmp_path / "clips.lance")
    staging = str(tmp_path / "staging")
    write_clips_parquet(staging, 2000, audio_cap_ms=20, rows_per_file=500)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "_versions"))
    shards = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    for i, f in enumerate(shards):
        os.rename(os.path.join(staging, f),
                  os.path.join(root, "data", f"frag-{i}.parquet"))
    out = str(tmp_path / "out")
    manifest = os.path.join(out, "manifest.jsonl")

    # run 1: SIGKILL after the FIRST fragment partition commits
    p = _spawn_lance(repo, root, out)
    lines1 = _wait_for_commits(manifest, p, 1)
    assert lines1 is not None, "no partition committed before timeout"
    p.send_signal(signal.SIGKILL)
    p.wait()
    after1 = [ln for ln in open(manifest).read().splitlines() if ln.strip()]

    # run 2 (first resume): SIGKILL again after at least one MORE commit
    p2 = _spawn_lance(repo, root, out)
    lines2 = _wait_for_commits(manifest, p2, len(after1) + 1)
    assert lines2 is not None, "resume made no progress before timeout"
    p2.send_signal(signal.SIGKILL)
    p2.wait()
    after2 = [ln for ln in open(manifest).read().splitlines() if ln.strip()]
    assert after2[:len(after1)] == after1  # committed prefix untouched

    # run 3 (second resume): completes; prefix still byte-identical
    p3 = _spawn_lance(repo, root, out)
    out3, _ = p3.communicate(timeout=300)
    assert p3.returncode == 0, out3
    summary = json.loads([ln for ln in out3.splitlines()
                          if ln.startswith("SUMMARY ")][0][len("SUMMARY "):])
    assert summary["rows"] == 2000
    assert summary["partitions"] == 5  # 4 fragment partitions + __global__
    final = [ln for ln in open(manifest).read().splitlines() if ln.strip()]
    assert final[:len(after2)] == after2
    frag_lines = [json.loads(ln) for ln in final
                  if json.loads(ln)["partition"] != "__global__"]
    committed_frags = sorted(f for ln in frag_lines for f in ln["fragments"])
    assert committed_frags == [f"fragment:{i}" for i in range(4)]
