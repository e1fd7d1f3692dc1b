"""Scaling-efficiency evidence (BASELINE.json north rule).

A real N-vs-4N-executor cluster is not available in this sandbox, so — per
the round instructions — the same job runs at two parallelism levels on the
same input (`local[8]` vs `local[32]`, one JVM per run, fresh process each)
and we report throughput at both plus efficiency

    eff = throughput(32) / (4 * throughput(8))

Workloads are the kernel/shuffle-bound cores of the engine (fixed driver
overhead excluded by measuring inside the session):
  * pyramid: z0..z14 split/assemble over seeded rectangles (Arrow kernels)
  * joins:   point-in-polygon + kNN cell joins at SF (JVM codegen + shuffle)
  * cluster: grid-mode per-zoom clustering (pure Column aggregation)

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
spark = bench.make_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")

# warm the JVM + python workers so fixed startup cost stays out of the measure
spark.range(1000000).selectExpr("sum(id)").collect()

out = {}
t = bench.bench_pyramid(spark, int(sys.argv[3]))
out["pyramid"] = {"sec": t["sec"], "work": t["tile_features"]}

# minhash over an 8x-amplified corpus (deterministic doc_id offsets) so the
# hash+join compute dominates per-stage fixed costs
from pyspark.sql import functions as F
from geojson_vt_spark.training import q_minhash_lsh_dedup

base = spark.read.parquet(f"{sf_dir}/documents.parquet")
n_docs = base.count()
amp = None
for i in range(8):
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
out["minhash_dedup_8x"] = {"sec": time.time() - t0, "work": n}

c = bench.bench_cluster(spark, int(sys.argv[4]))
out["cluster"] = {"sec": c["sec"], "work": c["cluster_rows"]}
print("RESULT" + json.dumps(out))
spark.stop()
"""


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


def run_once(cpus: int, sf_dir: str, n_feat: int, n_pts: int) -> dict:
    _no_orphan_jvms()
    code = _WORKER % {"repo": REPO}
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cpus), sf_dir, str(n_feat), str(n_pts)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT") :])
    raise RuntimeError(f"worker failed: {proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--n-features", type=int, default=250_000)
    ap.add_argument("--n-points", type=int, default=4_000_000)
    args = ap.parse_args()

    best: dict = {}
    for cpus in (8, 32):
        for _ in range(args.repeat):
            r = run_once(cpus, args.sf_dir, args.n_features, args.n_points)
            for k, v in r.items():
                cur = best.setdefault(k, {}).get(cpus)
                if cur is None or v["sec"] < cur["sec"]:
                    best[k][cpus] = v

    report = {"sf_dir": args.sf_dir, "workloads": {}}
    for k, by_cpu in best.items():
        t8, t32 = by_cpu[8], by_cpu[32]
        thr8 = t8["work"] / t8["sec"]
        thr32 = t32["work"] / t32["sec"]
        report["workloads"][k] = {
            "work": t8["work"],
            "sec_local8": round(t8["sec"], 2),
            "sec_local32": round(t32["sec"], 2),
            "throughput_local8": round(thr8, 1),
            "throughput_local32": round(thr32, 1),
            "scaling_efficiency": round(thr32 / (4 * thr8), 3),
        }
    tot8 = sum(v[8]["sec"] for v in best.values())
    tot32 = sum(v[32]["sec"] for v in best.values())
    report["total_sec_local8"] = round(tot8, 2)
    report["total_sec_local32"] = round(tot32, 2)
    report["overall_speedup_8_to_32"] = round(tot8 / tot32, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
