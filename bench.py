#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "extraction": {docs, bytes, docs_per_sec, mb_per_sec}}

Modes:
  (default)    full suite: synthetic-corpus extraction + testdata queries
  --scaling    run the extraction headline at several parallelism levels
               in fresh processes (RAY_GRAFT_SCALE_LEVELS, default
               "2,8,<cpus>") on the same corpus and report throughput at
               each + pairwise scaling efficiency
  --extraction-only  internal: one extraction run (used by --scaling)

This script OWNS its Ray session (ray.init(address="local")); the library
never calls ray.init.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("NHPR_BENCH_DOCS", "240000"))
BENCH_SEED = 42
GIANT_FRACTION = 0.002


def _corpus_dir() -> str:
    return f"/tmp/nhpr_bench_corpus_v2_{BENCH_DOCS}_{BENCH_SEED}"


def ensure_corpus() -> tuple[str, int]:
    """Generate (once) the synthetic interleaved bench corpus, in parallel.

    Returns (dir, total_input_html_bytes).
    """
    import ray

    out = _corpus_dir()
    meta = os.path.join(out, "_meta.json")
    if os.path.exists(meta):
        try:
            with open(meta) as f:
                return out, json.load(f)["html_bytes"]
        except (json.JSONDecodeError, KeyError):
            pass  # truncated meta from a crashed run: regenerate below

    os.makedirs(out, exist_ok=True)
    rows_per_file = 2000
    starts = list(range(0, BENCH_DOCS, rows_per_file))

    @ray.remote
    def gen(start: int) -> int:
        from node_html_parser_ray.sources.corpus import write_corpus_shard

        n = min(rows_per_file, BENCH_DOCS - start)
        _, html_chars = write_corpus_shard(
            out, start, n, seed=BENCH_SEED, giant_fraction=GIANT_FRACTION
        )
        return html_chars

    html_bytes = sum(ray.get([gen.remote(s) for s in starts]))
    # atomic: a crash mid-write must not leave a truncated meta that blocks
    # every future bench run (same mkstemp+replace pattern as the manifest)
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=out, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"n_docs": BENCH_DOCS, "html_bytes": html_bytes}, f)
    os.replace(tmp, meta)
    return out, html_bytes


def run_extraction(corpus_dir: str) -> dict:
    """Headline: read -> parse/extract -> write parquet (full streaming).

    A small untimed warmup pass first: Ray worker processes start lazily and
    pay import cost once per process — a production job at 10^12 docs
    amortises that to nothing, so the timed number should too.
    """
    import shutil

    import ray

    from node_html_parser_ray.stages.extract_stage import extract_batch

    out_dir = f"/tmp/nhpr_bench_out_{os.getpid()}"
    files = [
        os.path.join(corpus_dir, f)
        for f in sorted(os.listdir(corpus_dir))
        if f.endswith(".parquet")
    ]
    n_workers = int(ray.cluster_resources().get("CPU", 8))

    @ray.remote
    def _warm() -> int:
        # import the kernel in this worker process and hold the slot briefly
        # so all n_workers processes actually start
        import node_html_parser_ray.stages.extract_stage  # noqa: F401

        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 0.5:
            pass
        return os.getpid()

    ray.get([_warm.remote() for _ in range(n_workers)])

    def one_run() -> float:
        t0 = time.perf_counter()
        # one block per input file: a SplitBlocks stage between read and map
        # costs ~35% wall (measured); file-granular blocks feed the fused
        # map+write operator directly
        ds = ray.data.read_parquet(files, override_num_blocks=len(files))
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=128)
        ds.write_parquet(out_dir, use_dictionary=False)
        elapsed = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        return elapsed

    # first run untimed (residual worker/executor warmup), second timed —
    # a production job at corpus scale amortises startup to nothing
    one_run()
    return {"sec": one_run()}


def run_query_suite(sf_dir: str) -> dict[str, float]:
    """Time each driver query over the testdata tables."""
    import __ray_entry__

    timings: dict[str, float] = {}
    for name, fn in __ray_entry__.queries().items():
        t0 = time.perf_counter()
        result = fn(sf_dir)
        # force execution
        if hasattr(result, "materialize"):
            result = result.materialize()
            _ = result.count()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--extraction-only", action="store_true")
    parser.add_argument("--control-only", action="store_true")
    parser.add_argument("--cpus", type=int, default=NUM_CPUS)
    parser.add_argument("--skip-queries", action="store_true")
    args = parser.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    if args.control_only:
        import ray

        wps = run_compute_control(args.cpus)
        print(json.dumps({"metric": "compute_control", "cpus": args.cpus,
                          "work_per_sec": round(wps, 1)}))
        ray.shutdown()
        return

    # window annotation BEFORE the parent session exists: child processes
    # own their Ray sessions; ~5 s, and the official artifact records
    # whether the host window was clean (round-4 verdict #1)
    control = None if os.environ.get("NHPR_BENCH_NO_CONTROL") else window_control()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    corpus_dir, html_bytes = ensure_corpus()

    extraction = run_extraction(corpus_dir)
    sec = extraction["sec"]
    result = {
        "metric": "extraction_and_query_suite_wall_sec",
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": args.cpus,
        "extraction": {
            "n_docs": BENCH_DOCS,
            "html_bytes": html_bytes,
            "sec": round(sec, 3),
            "docs_per_sec": round(BENCH_DOCS / sec, 1),
            "mb_per_sec": round(html_bytes / sec / 1e6, 2),
        },
    }
    if control is not None:
        result["window_control"] = control
    if args.extraction_only:
        result["metric"] = "extraction_wall_sec"
        result["value"] = round(sec, 3)
        result["queries"] = {"extraction": round(sec, 3)}
        print(json.dumps(result))
        ray.shutdown()
        return

    queries = {} if args.skip_queries else run_query_suite(SF_DIR)
    queries["extraction"] = round(sec, 3)
    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    print(json.dumps(result))
    ray.shutdown()


def run_compute_control(cpus: int) -> float:
    """Machine-ceiling control: embarrassingly parallel pure-ALU Ray tasks.

    Zero memory traffic, zero I/O, no shared state — on ideal hardware this
    scales perfectly with num_cpus.  On this sandbox it does NOT (few-core
    turbo + shared host), so its pair efficiency is the box's own ceiling
    for CPU-bound work and the honest denominator for the extraction pairs.
    Returns work-units/sec.
    """
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)

    @ray.remote
    def spin(n: int) -> int:
        s = 0
        for i in range(n):
            s += i * i
        return s

    n_tasks = 64
    ray.get([spin.remote(100_000) for _ in range(cpus)])  # warm workers
    t0 = time.perf_counter()
    ray.get([spin.remote(3_000_000) for _ in range(n_tasks)])
    return n_tasks / (time.perf_counter() - t0)


def _child_json(mode: str, cpus: int) -> dict:
    """Run one child bench level in a fresh process; fail LOUDLY with its
    stderr on error (a silent IndexError on empty stdout hid which level
    died and why)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), mode,
         "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=REPO,
        # children never re-run the window annotation: --scaling measures
        # its own controls per level
        env={**os.environ, "RAY_GRAFT_CPUS": str(cpus),
             "NHPR_BENCH_NO_CONTROL": "1"},
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"scaling child {mode} cpus={cpus} failed "
            f"(rc={proc.returncode}); stderr tail:\n"
            + "\n".join(proc.stderr.strip().splitlines()[-15:])
        )
    return json.loads(lines[-1])


# one shared streaming-copy kernel for BOTH the single-stream and the
# aggregate probe, so the two readings are like-for-like (same buffer
# size, same sustained-mean statistic) and cannot drift independently.
# mean-over-window, NOT best-of: a health probe must see bursty tenants;
# best-of-reps picks the least-contended instant and reads optimistic.
# The child busy-sleeps to a shared wall-clock start so all timed
# windows overlap (no barrier = sequential spawn skew lets each child
# run alone and a contended window sums to a clean-looking aggregate),
# then reports how late it was if it missed the barrier.
_BW_CHILD = """
import json, sys, time
import numpy as np
mb, reps, start_at = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
n = mb * 1024 * 1024 // 8
src = np.ones(n)
dst = np.empty_like(src)
np.copyto(dst, src)  # touch pages outside the timed region
late = time.time() - start_at
if late < 0:
    time.sleep(-late)
    late = 0.0
t0 = time.perf_counter()
for _ in range(reps):
    np.copyto(dst, src)
dt = time.perf_counter() - t0
print(json.dumps({"gb_s": reps * 2 * n * 8 / dt / 1e9, "late_s": late}))
"""


def _bw_probe(procs: int, mb: int = 128, reps: int = 4,
              _lead: float | None = None) -> dict:
    """Streaming-copy memory bandwidth (GB/s, read+write) over ``procs``
    concurrent child processes with a synchronized timed window.

    The pure-ALU control misses bandwidth tenants entirely, and a single
    stream cannot saturate the socket, so a co-tenant can eat most of the
    TOTAL bandwidth while the single-stream reading stays normal
    (observed: extraction 2-3x slow with ALU 2->8 at 0.903 "clean" and
    single-stream at 17-20 GB/s, while concurrent per-proc streams
    collapsed to 2-8 GB/s).  ``procs=1`` is the single-stream reading;
    ``procs=4`` the aggregate.  Children fail LOUDLY (a silently dropped
    child would make probe breakage read as extreme contention); if any
    child misses the start barrier the probe re-runs once with a longer
    lead and reports ``sync_ok`` either way.  Clean bands for this box
    are recorded in BASELINE.md.  Plain subprocesses, never forking a
    Ray-initialized parent."""
    lead = _lead if _lead is not None else 2.0 + 0.3 * procs
    start_at = time.time() + lead
    children = [
        subprocess.Popen(
            [sys.executable, "-c", _BW_CHILD, str(mb), str(reps), repr(start_at)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for _ in range(procs)
    ]
    outs, errs = [], []
    for ch in children:
        out, err = ch.communicate()
        if ch.returncode != 0 or not out.strip():
            errs.append(f"rc={ch.returncode}: "
                        + "\n".join(err.strip().splitlines()[-5:]))
        else:
            outs.append(json.loads(out.strip().splitlines()[-1]))
    if errs:
        raise RuntimeError(
            f"bandwidth probe: {len(errs)}/{procs} children failed:\n"
            + "\n".join(errs))
    max_late = max(o["late_s"] for o in outs)
    if max_late > 0 and _lead is None:  # one retry with a longer lead
        return _bw_probe(procs, mb, reps, _lead=lead * 2 + max_late)
    return {
        "gb_s": round(sum(o["gb_s"] for o in outs), 2),
        "sync_ok": max_late == 0.0,
    }


def _bw_readings() -> dict:
    """Single-stream + 4-proc aggregate bandwidth, as JSON-ready fields.

    `bandwidth_clean` folds the BASELINE.md clean bands (~16-20 single /
    ~65-70 agg4 GB/s on this box, measured with this same kernel) into a
    machine-readable bit at conservative ~70%-of-band thresholds, so a
    recorded JSON is interpretable without the prose."""
    single = _bw_probe(1)
    agg4 = _bw_probe(4)
    return {
        "stream_bandwidth_gb_s": single["gb_s"],
        "stream_bandwidth_agg4_gb_s": agg4["gb_s"],
        "bandwidth_sync_ok": single["sync_ok"] and agg4["sync_ok"],
        "bandwidth_clean": single["gb_s"] >= 12.0 and agg4["gb_s"] >= 48.0,
    }


def window_control() -> dict:
    """Host-window health annotation (round-4 verdict #1): the pure-ALU
    control at 2 and 8 CPUs, run in fresh child processes BEFORE the suite.
    On a clean window the 2->8 control efficiency reads >= ~0.9; a
    contended window (another tenant saturating the socket / memory bus)
    reads lower, which inflates every parse-heavy wall time below.  The
    reading ships inside the bench JSON so the recorded number is
    self-annotating — compare suites only within like windows
    (BASELINE.md 'Bench host variance').

    `window_clean` covers only the ALU dimension — necessary, not
    sufficient; `bandwidth_clean` covers the memory-bandwidth dimension
    (see _bw_readings); a window is clean iff BOTH read true."""
    wps = {c: _child_json("--control-only", c)["work_per_sec"]
           for c in (2, 8)}
    eff = (wps[8] / wps[2]) / 4.0
    return {
        "control_work_per_sec": {str(c): round(wps[c], 1) for c in wps},
        "control_efficiency_2_8": round(eff, 3),
        **_bw_readings(),
        "window_clean": eff >= 0.9,
    }


def run_scaling(args) -> None:
    """Same job at multiple parallelism levels in fresh processes
    (north_rule two-cluster-size evidence: N vs 4N).

    Levels default to 2, 8, 32 — two N->4N pairs.  On a real cluster, 4N
    nodes bring 4N x memory bandwidth and 4N x turbo headroom; on this
    single shared sandbox node all levels share one socket, so each pair is
    reported alongside a pure-compute machine-ceiling control (see
    run_compute_control) and the ratio of extraction speedup to control
    speedup ("efficiency_vs_machine_ceiling") — the quantity a real N->4N
    cluster would see, where the ceiling is ~1.0 per added node.
    """
    levels = [
        int(x)
        for x in os.environ.get("RAY_GRAFT_SCALE_LEVELS", f"2,8,{args.cpus}").split(",")
    ]
    results = {}
    controls = {}
    bw = {}
    for cpus in levels:
        results[cpus] = _child_json("--extraction-only", cpus)
        controls[cpus] = _child_json("--control-only", cpus)["work_per_sec"]
        # bandwidth annotation PER LEVEL, inside the trial loop — a
        # tenant active during one level but gone by trial end must show
        # against that level's numbers, not a post-trial reading.  Let
        # the just-exited Ray child's teardown settle first: its raylet
        # cleanup eats bandwidth for a few seconds and reads as a fake
        # tenant (trial 24: level-32 agg4 21.5 GB/s right after the
        # best-ever extraction and ALU readings)
        time.sleep(4.0)
        bw[cpus] = _bw_readings()

    def eff(lo: int, hi: int) -> dict:
        tp_lo = results[lo]["extraction"]["docs_per_sec"]
        tp_hi = results[hi]["extraction"]["docs_per_sec"]
        speedup = tp_hi / tp_lo
        ctl_speedup = controls[hi] / controls[lo]
        return {
            "cpus": [lo, hi],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (hi / lo), 3),
            "machine_ceiling_speedup": round(ctl_speedup, 3),
            "machine_ceiling_efficiency": round(ctl_speedup / (hi / lo), 3),
            "efficiency_vs_machine_ceiling": round(
                min(speedup / ctl_speedup, 1.0), 3
            ),
        }

    pairs = [eff(levels[i], levels[i + 1]) for i in range(len(levels) - 1)]
    out = {
        "metric": "scaling_efficiency",
        "unit": "ratio",
        "value": pairs[0]["efficiency"],
        "sf": SF_DIR,
        "num_cpus": levels[-1],
        "queries": {
            f"extraction_cpus_{c}": results[c]["extraction"]["sec"] for c in levels
        },
        "throughput_docs_per_sec": {
            str(c): results[c]["extraction"]["docs_per_sec"] for c in levels
        },
        "compute_control_work_per_sec": {str(c): controls[c] for c in levels},
        "stream_bandwidth_gb_s": {
            str(c): bw[c]["stream_bandwidth_gb_s"] for c in levels},
        "stream_bandwidth_agg4_gb_s": {
            str(c): bw[c]["stream_bandwidth_agg4_gb_s"] for c in levels},
        "bandwidth_clean": {
            str(c): bw[c]["bandwidth_clean"] for c in levels},
        "pairs": pairs,
        "levels": levels,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
