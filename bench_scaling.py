"""Scaling-efficiency evidence (BASELINE.json north rule).

A real N-vs-4N-executor cluster is not available in this sandbox, so — per
the round instructions — the same job runs at two parallelism levels on the
same input (one JVM per run, fresh process each) and we report throughput at
both plus efficiency

    eff = throughput(4N) / (4 * throughput(N))

Workloads are the kernel/shuffle-bound cores of the engine (fixed driver
overhead excluded by measuring inside the session):
  * pyramid: z0..z14 fused split/assemble over seeded rectangles (whole-batch
    numpy kernels through Arrow)
  * minhash: LSH dedup over an 8x-amplified corpus (JVM codegen + shuffle)
  * cluster: grid-mode clustering (batched level engine: one anchor-cell
    exchange + partition-local numpy kernel per k zooms)
  * pip: the join-rows/sec probe — point_in_box_join over synthetic points
    vs a broadcast 20x20 box grid (cell equi-join + range refine + partial
    agg, pure whole-stage codegen)

Every workload reports the pairs local[1]->local[4], local[2]->local[8] and
local[8]->local[32] (minhash skips the 1-core leg — a one-core shuffle job
there adds an hour per rep for no extra signal). Host-ceiling context,
measured by pure probes (BASELINE.md): a multi-process numpy triad scales
1->4 at efficiency ~1.0 but is FLAT 4->8 (memory bandwidth saturates at ~4
concurrent streams), a pure-python ALU loop scales 0.91 through 8 procs,
and ~32-thread JVMs burn 45-75% guest system time. So the 1->4 pair — fully
below every host knee — is the cleanest engine-scaling signal; 2->8 mixes
in the bandwidth ceiling; 8->32 measures the virtualization artifact. All
are reported; nothing is hidden.

Methodology: fresh JVM per leg, paired legs run back-to-back so both see
the same host window (this VM's wall-clock for identical jobs varies 2-7x),
minima over --repeat reps per leg. The cluster workload additionally wants
a floor-amortized size (--n-points 48000000): its per-batch fixed job
latency (two-tier serial barriers, see grid.batch_plan) is size-independent and vanishes
at corpus scale, so small inputs understate the engine's scaling. The
cluster build is otherwise a streaming linear-scan workload: on this
single-socket microVM its core-scaling is bounded by the measured DRAM
ceiling (aggregate stream bandwidth grows only ~1.5x from 1 to 8 procs —
see BASELINE.md probes), a limit that does not exist for N->4N real
executors, which multiply memory controllers with machines.

Usage: python bench_scaling.py [--sf-dir DIR] [--repeat N]
Writes one JSON line; BASELINE.md records the table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import bench

cpus = int(sys.argv[1])
sf_dir = sys.argv[2]
n_feat = int(sys.argv[3])
n_pts = int(sys.argv[4])
workloads = set(sys.argv[5].split(","))
spark = bench.make_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")

# warm the JVM + python workers so fixed startup cost stays out of the measure
spark.range(1000000).selectExpr("sum(id)").collect()

out = {}
if "pyramid" in workloads:
    t = bench.bench_pyramid(spark, n_feat)
    out["pyramid"] = {"sec": t["sec"], "work": t["tile_features"]}

if "minhash" in workloads:
    # minhash over an AMP-x-amplified corpus (deterministic doc_id offsets)
    # so the hash+join compute dominates per-stage fixed costs. The r=4
    # banding cut candidate volume so sharply that the round-2 8x size no
    # longer exercises the engine — pass a bigger --amp for scaling legs.
    amp_n = int(sys.argv[6])
    from pyspark.sql import functions as F
    from geojson_vt_spark.training import q_minhash_lsh_dedup

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = base.count()
    amp = None
    for i in range(amp_n):
        part = base.select(
            (F.col("doc_id") + i * n_docs).alias("doc_id"),
            "text", "lang",
            F.concat(F.col("source"), F.lit(f"_{i}")).alias("source"),
            "n_chars",
        )
        amp = part if amp is None else amp.unionByName(part)
    amp_path = "/dev/shm/bench-docs/documents.parquet"
    amp.write.mode("overwrite").parquet(amp_path)
    t0 = time.time()
    n = q_minhash_lsh_dedup(spark, "/dev/shm/bench-docs").count()
    out["minhash_dedup_" + str(amp_n) + "x"] = {"sec": time.time() - t0, "work": n}

if "cluster" in workloads:
    c = bench.bench_cluster(spark, n_pts)
    out["cluster"] = {"sec": c["sec"], "work": c["cluster_rows"]}

if "pip" in workloads:
    # join-rows/sec scaling probe (the north-rule metric's second half):
    # broadcast cell equi-join + range refine + partial agg, pure codegen
    p = bench.bench_pip_scale(spark, int(sys.argv[7]))
    out["pip"] = {"sec": p["sec"], "work": p["join_rows"]}
print("RESULT" + json.dumps(out))
spark.stop()
"""

# workload -> (leg pairs, which cpu counts need that workload)
PAIRS = {
    "pyramid": [(1, 4), (2, 8), (8, 32)],
    # the r=4 banding made 1-core minhash tractable, so the clean
    # below-the-DRAM-knee 1->4 pair is measurable for it too
    "minhash": [(1, 4), (2, 8), (8, 32)],
    "cluster": [(1, 4), (2, 8), (8, 32)],
    "pip": [(1, 4), (2, 8), (8, 32)],
}
WORKLOADS_BY_CPUS = {
    1: "pyramid,minhash,cluster,pip",
    4: "pyramid,minhash,cluster,pip",
    2: "pyramid,minhash,cluster,pip",
    8: "pyramid,minhash,cluster,pip",
    32: "pyramid,minhash,cluster,pip",
}


def _no_orphan_jvms(timeout_s: int = 60) -> None:
    import time

    deadline = time.time() + timeout_s
    while True:
        out = subprocess.run(["pgrep", "-c", "java"], capture_output=True, text=True)
        n = int(out.stdout.strip() or 0)
        if n == 0:
            return
        if time.time() > deadline:
            raise RuntimeError(
                f"{n} java process(es) still running after {timeout_s}s — "
                "measurements would be contended; kill them first"
            )
        time.sleep(2)


def run_once(
    cpus: int, sf_dir: str, n_feat: int, n_pts: int, only: set, amp: int,
    n_join_pts: int,
) -> dict:
    _no_orphan_jvms()
    wl = ",".join(
        w for w in WORKLOADS_BY_CPUS[cpus].split(",") if w in only
    )
    if not wl:
        return {}
    code = _WORKER % {"repo": REPO}
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cpus), sf_dir, str(n_feat),
         str(n_pts), wl, str(amp), str(n_join_pts)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"worker failed: {proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--n-features", type=int, default=250_000)
    ap.add_argument("--n-points", type=int, default=4_000_000)
    ap.add_argument("--amp", type=int, default=8,
                    help="minhash corpus amplification factor")
    ap.add_argument("--n-join-points", type=int, default=100_000_000,
                    help="point count for the pip join-rows/sec probe")
    ap.add_argument("--only", default="pyramid,minhash,cluster,pip",
                    help="comma filter of workloads to run")
    ap.add_argument("--legs", default="4,1,8,2,32",
                    help="comma list of core widths (rep-0 order)")
    args = ap.parse_args()
    only = set(args.only.split(","))

    best: dict = {}
    # paired legs adjacent in time (4 then 1, 8 then 2) so each pair sees
    # the same host window; reps outermost so minima span windows.
    # The leg ORDER alternates per rep: whichever leg runs first in a pair
    # absorbs the campaign's cold window (measured: an 8-core-first pair read
    # eff 0.07 while the same pair 2-core-first read 0.64), so even reps run
    # wide-first and odd reps the mirror — minima over >=2 reps see each leg
    # in each position.
    legs = tuple(int(c) for c in args.legs.split(","))
    for rep in range(args.repeat):
        order = legs if rep % 2 == 0 else tuple(reversed(legs))
        for cpus in order:
            r = run_once(cpus, args.sf_dir, args.n_features, args.n_points,
                         only, args.amp, args.n_join_points)
            for k, v in r.items():
                cur = best.setdefault(k, {}).get(cpus)
                if cur is None or v["sec"] < cur["sec"]:
                    best[k][cpus] = v

    report = {"sf_dir": args.sf_dir, "n_features": args.n_features,
              "workloads": {}}
    for k, by_cpu in best.items():
        entry = {
            "work": by_cpu[max(by_cpu)]["work"],
            "sec": {str(c): round(v["sec"], 2) for c, v in by_cpu.items()},
        }
        base = "minhash" if k.startswith("minhash_dedup_") else k
        for lo, hi in PAIRS.get(base, []):
            if lo in by_cpu and hi in by_cpu:
                thr_lo = by_cpu[lo]["work"] / by_cpu[lo]["sec"]
                thr_hi = by_cpu[hi]["work"] / by_cpu[hi]["sec"]
                entry[f"efficiency_{lo}_{hi}"] = round(thr_hi / (4 * thr_lo), 3)
        report["workloads"][k] = entry
    print(json.dumps(report))


if __name__ == "__main__":
    main()
