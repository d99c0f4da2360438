#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "clips_per_sec": ...}

--scaling: run the headline clips-validation twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the SAME input (the sandbox proxy for N- vs
4N-node clusters) and report throughput at both plus scaling efficiency
(= (rate32/rate8)/4); also appends the result to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CLIPS_N = int(os.environ.get("GRAFT_CLIPS_N", "150000"))
CLIPS_CAP_MS = 20
CLIPS_CACHE = f"/tmp/graft_clips_{CLIPS_N}_{CLIPS_CAP_MS}"


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _ensure_clips():
    """Deterministic clips parquet, written once and cached across runs
    (generation cost must not pollute the measured validation time)."""
    from gojsonschema_ray.datagen import write_clips_parquet

    write_clips_parquet(CLIPS_CACHE, CLIPS_N, audio_cap_ms=CLIPS_CAP_MS,
                        rows_per_file=25_000)
    return CLIPS_CACHE


def bench_clips_validate(num_cpus: int) -> dict:
    """Headline: full constraint-eval throughput on the clips table —
    vectorized schema pass + actor-pool audio/PCM pass + uniqueness shuffle."""
    import ray.data as rd

    from gojsonschema_ray.pipelines.flagship import AUDIO_COLUMNS, validate_clips

    path = _ensure_clips()
    audio_actors = max(2, num_cpus - 4)  # leave cores for read + schema pass
    t0 = time.time()
    ds = rd.read_parquet(path, columns=AUDIO_COLUMNS)
    viol = validate_clips(ds, with_audio=True, with_uniqueness=True,
                          audio_concurrency=audio_actors,
                          audio_batch_size=256, audio_cap_ms=CLIPS_CAP_MS)
    n_viol = viol.count()
    dt = time.time() - t0
    return {"sec": dt, "clips": CLIPS_N, "clips_per_sec": CLIPS_N / dt,
            "violations": n_viol}


def bench_queries(sf_dir: str) -> dict:
    """The oracle-checked pipelines at bench scale."""
    import __ray_entry__ as M

    names = ["lineitem_bounds", "orders_enum", "documents_schema",
             "events_unique_users", "lineitem_stats", "token_counts_by_lang",
             "events_props_json", "ann_top5", "sketch_lineitem",
             "dup_nchars_groups", "quality_by_source", "minhash_near_dups"]
    qs = M.queries()
    out = {}
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "count") and not hasattr(res, "to_dict"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def _warmup(sf_dir: str):
    """One tiny pipeline so worker-pool startup doesn't pollute the first
    measured query."""
    import ray.data as rd

    rd.read_parquet(os.path.join(sf_dir, "region.parquet")).map_batches(
        lambda t: t, batch_format="pyarrow").count()


def run_main() -> dict:
    _init_ray(NUM_CPUS)
    _warmup(SF_DIR)
    q = bench_queries(SF_DIR)
    clips = bench_clips_validate(NUM_CPUS)
    q["clips_validate"] = round(clips["sec"], 3)
    total = sum(q.values())
    result = {
        "metric": "validated clips/sec (constraint-eval throughput)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": q,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "clips_n": clips["clips"],
        "clips_per_sec": round(clips["clips_per_sec"], 1),
        "clips_violations": clips["violations"],
    }
    import ray

    ray.shutdown()
    return result


def run_scaling_worker(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    r = bench_clips_validate(num_cpus)
    import ray

    ray.shutdown()
    return {"num_cpus": num_cpus, **r}


def run_scaling() -> dict:
    """Two fresh processes at 8 and 32 CPUs on the same cached input."""
    # generate the cache once (outside both measured runs)
    _init_ray(8)
    _ensure_clips()
    import ray

    ray.shutdown()

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker",
             str(cpus)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=3600,
        )
        line = [l for l in out.stdout.strip().split("\n") if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[8]["clips_per_sec"], results[32]["clips_per_sec"]
    eff = (r32 / r8) / 4.0
    report = {
        "metric": "scaling efficiency 8->32 cpus (proxy for N->4N nodes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "clips_n": CLIPS_N,
        "rate_8cpu": round(r8, 1),
        "rate_32cpu": round(r32, 1),
        "sec_8cpu": round(results[8]["sec"], 2),
        "sec_32cpu": round(results[32]["sec"], 2),
    }
    _append_baseline(report)
    return report


def _append_baseline(report: dict):
    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join("BENCH", "BASELINE.md")
    lines = []
    if not os.path.exists(path):
        lines.append("# BENCH/BASELINE — measured numbers\n")
        lines.append("| clips | rate@8cpu (clips/s) | rate@32cpu (clips/s) | "
                     "efficiency (rate32/rate8)/4 |\n")
        lines.append("|---|---|---|---|\n")
    lines.append(f"| {report['clips_n']} | {report['rate_8cpu']} | "
                 f"{report['rate_32cpu']} | {report['value']} |\n")
    with open(path, "a") as f:
        f.writelines(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-worker", type=int, default=None)
    args, _ = ap.parse_known_args()
    if args.scaling_worker is not None:
        print(json.dumps(run_scaling_worker(args.scaling_worker)))
    elif args.scaling:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_main()))


if __name__ == "__main__":
    main()
