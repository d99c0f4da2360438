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
