"""Multi-JVM scaling evidence: separate executor PROCESSES, not threads.

VERDICT r3 next-step #3: the single-JVM local[8]->local[32] efficiency
(0.43) was attributed to the one socket's memory bus; this tool measures
the same N->4N pair at PROCESS granularity — Spark's
``local-cluster[n_executors, cores, mem_mb]`` launches each executor as
its own JVM with its own heap and shuffle client, which is the execution
shape of a real cluster (the reference's master/worker split:
MasterService.java / WorkerService.java map to driver / executor JVMs).

Protocol (mirrors tools/bench_scaling.py, same pre-materialized Zipf
graph, same fixed-superstep reference-exact PageRank, superstep loop
timed only):

  N  = local-cluster[1,8,<mem>]  — 1 executor JVM,  8 cores
  4N = local-cluster[4,8,<mem>]  — 4 executor JVMs, 8 cores each

Each run goes through the REAL ``spark-submit --py-files`` launch path
(entry point B) in a fresh subprocess; ``get_spark`` detects the
submitted gateway and overrides neither master nor shuffle conf.

Usage:
  python tools/bench_scaling_cluster.py [--trials 2]
  python tools/bench_scaling_cluster.py --run     # internal (submitted)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EDGES_PATH = str(REPO / ".bench" / "scaling_edges.parquet")
SUPERSTEPS = 10
# Per-executor heap. The single-JVM local[*] runs use one 24g heap
# (session.py); in local-cluster the 1-executor level must hold the
# ENTIRE cached adjacency in its own heap — 8g OOMs (executor exit
# code 52) on the 96M-edge graph, 16g holds it with execution headroom.
# Kept constant across cluster sizes: on a real cluster, scaling from N
# to 4N executors scales total memory too; per-executor memory is the
# controlled variable.
EXEC_MEM_MB = 16384


def measured_run() -> None:
    """Runs INSIDE spark-submit: master/memory come from the command."""
    from hugegraph_computer_spark.graph.graph import Graph
    from hugegraph_computer_spark.operators import pagerank
    from hugegraph_computer_spark.session import get_spark

    total_cores = int(os.environ["BENCH_TOTAL_CORES"])
    spark = get_spark(
        app_name=f"scaling-cluster-{total_cores}",
        shuffle_partitions=total_cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(EDGES_PATH)
    g = Graph.from_edges(edges, symmetrize=False, dedup=False,
                         num_partitions=total_cores)
    g.num_vertices()
    g.adjacency().count()  # untimed warmup: cached adjacency on executors
    sym_edges = g.edges.count()
    t0 = time.time()
    pagerank(g, l1_threshold=-1.0, max_supersteps=SUPERSTEPS).count()
    dt = time.time() - t0
    print("RESULT " + json.dumps({
        "master": spark.conf.get("spark.master"),
        "total_cores": total_cores,
        "sym_edges": sym_edges,
        "supersteps": SUPERSTEPS,
        "seconds": round(dt, 3),
        "edges_per_sec": round(sym_edges * SUPERSTEPS / dt),
    }))
    spark.stop()


def submit(n_exec: int, cores: int) -> dict:
    import pyspark

    from tools.make_zip import make_zip

    zip_path = make_zip()
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    env = dict(os.environ)
    env["BENCH_TOTAL_CORES"] = str(n_exec * cores)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{n_exec},{cores},{EXEC_MEM_MB}]",
        # local-cluster's third parameter is only the worker's OFFER;
        # the executor JVM heap is spark.executor.memory (default 1g —
        # which OOMed with exit code 52 on the 96M-edge adjacency).
        "--conf", f"spark.executor.memory={EXEC_MEM_MB}m",
        "--driver-memory", "6g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        __file__, "--run",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO),
                         timeout=1800, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"local-cluster[{n_exec},{cores}] run failed")
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    if "--run" in sys.argv:
        measured_run()
        return
    trials = 2
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    # cores PER EXECUTOR. 8 saturates the box at 4 executors (32 cores —
    # the memory-bus regime); 2 keeps 4 executors at 8 total cores, the
    # below-bandwidth-ceiling regime where the north rule's >=0.8 N->4N
    # efficiency is measurable at process granularity.
    cores = 8
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])

    from tools.bench_scaling import prepare

    prepare()
    best: dict[int, dict] = {}
    for n_exec in (1, 4):
        for t in range(trials):
            r = submit(n_exec, cores)
            print(f"trial {t}: {r}")
            if n_exec not in best or r["seconds"] < best[n_exec]["seconds"]:
                best[n_exec] = r
    tp1, tp4 = best[1]["edges_per_sec"], best[4]["edges_per_sec"]
    summary = {
        "protocol": "local-cluster[N,%d,%d] via spark-submit, best-of-%d, "
                    "fixed %d-superstep PageRank on the shared Zipf graph"
                    % (cores, EXEC_MEM_MB, trials, SUPERSTEPS),
        "one_executor": best[1],
        "four_executors": best[4],
        "per_executor_tp_1": tp1,
        "per_executor_tp_4": round(tp4 / 4),
        "scaling_efficiency_1_to_4": round(tp4 / tp1 / 4, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
