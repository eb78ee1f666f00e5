"""Scaling-efficiency evidence (north_rule two-cluster-size criterion).

Runs the identical fast-mode dedup job on the identical synthetic input
at two parallelism levels (local[N] vs local[4N] — the sandbox stand-in
for N vs 4N executors), reports throughput at both plus scaling
efficiency, and asserts the outputs are identical (order-insensitive).

`--weak` additionally runs the executor-analog weak-scaling demo: ONE
pinned 2-core job vs FOUR fully-independent pinned 2-core jobs on
disjoint cpusets (own JVM, GC, python workers — the purest single-host
model of "4 executors"). Its efficiency bounds what ANY Spark workload
can demonstrate on this host: the four jobs share nothing but the
memory bus, so their slowdown is pure silicon contention, not pipeline
structure. Results merge into BENCH_SCALING.json under `weak_scaling`.

Default pair: local[2] → local[8]. The host exposes 32 physical cores
(no SMT, no cgroup quota, no visible steal), but Spark-free probes
(scripts/cpu_ceiling.py → CPU_CEILING.json) show ALL throughput
classes collapse above ~8-16 processes, and memory-bound work is
bus-limited even at 2→8 (streaming memcpy 0.61-0.85 vs ALU 0.93-0.97)
— so 8→32 measures the silicon, the N→4N demonstration must sit in
the ALU-linear region, and a shuffle/cache-heavy pipeline must be read
against the membw ceiling, not the ALU one. See BASELINE.md.

    python scripts/scaling_bench.py [--docs 200000] [--low 2] [--high 8]

Each run happens in a fresh subprocess (one JVM per master setting).
Writes JSON to stdout and BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dedup.session import get_spark
from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.pipeline import run_dedup

n_docs, cores, corpus_dir = {docs}, {cores}, {corpus_dir!r}
# shuffle partitioning is held CONSTANT across the two parallelism
# levels ({parts} partitions), like a real cluster keeps its
# partitioning while executors vary — only the executor count (local
# threads) changes between the runs
spark = get_spark("scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions={parts})
# cc_driver_max_edges=0 (loop mode, the default gate protocol) forces
# the distributed star loop: the north-rule gate measures the LARGE-
# graph regime — at the 10^12-doc design point the verified edge set
# far exceeds the 10M driver-union-find bound, so the loop is what
# actually runs there. Hybrid mode (production default) measures the
# absolute-throughput configuration instead.
cfg = DedupConfig(cc_driver_max_edges={cc_bound})
if corpus_dir:
    # corpus pre-generated ONCE by the parent (driver-side pandas
    # generation of multi-million-doc corpora is single-threaded and
    # would dominate every leg's wall without touching the clock)
    pages = (
        spark.read.parquet(corpus_dir + "/pages.parquet")
        .withColumn("warc_ts", F.timestamp_seconds(F.col("warc_ts_epoch")))
        .drop("warc_ts_epoch")
    )
    sources = spark.read.parquet(corpus_dir + "/sources.parquet")
else:
    pages, _t, sources = corpus_dataframes(spark, n_docs, seed=42)
pages = pages.repartition({parts}).persist()
n = pages.count()  # materialize input before the clock starts
t0 = time.time()
res = run_dedup(pages, cfg, sources=sources)
# one action drives the whole DAG; fingerprint = order-insensitive hash
row = res.assignments.agg(
    F.count(F.lit(1)).alias("n"),
    F.bit_xor(F.xxhash64("url", "cluster_id")).alias("h"),
).collect()[0]
wall = time.time() - t0
n_clusters = res.survivors.count()
print(json.dumps({{"cores": cores, "docs": n, "wall_s": wall,
                  "docs_per_sec": n / wall, "assign_rows": row["n"],
                  "assign_hash": row["h"], "clusters": n_clusters}}))
spark.stop()
"""


def ensure_corpus_cache(docs: int, seed: int = 42) -> str:
    """Generate the synthetic corpus ONCE to parquet (pure pandas +
    pyarrow, no Spark session) so every measured leg reads the identical
    input instead of re-running the single-threaded generator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(
        tempfile.gettempdir(), f"dedup_scaling_corpus_{docs}_{seed}"
    )
    pages_path = os.path.join(out, "pages.parquet")
    sources_path = os.path.join(out, "sources.parquet")
    if os.path.exists(pages_path) and os.path.exists(sources_path):
        return out
    sys.path.insert(0, REPO)
    from dedup.corpus import generate_corpus

    sys.stderr.write(f"[scaling] generating {docs}-doc corpus cache…\n")
    pages_pdf, _truth, src_pdf = generate_corpus(docs, seed)
    pages_pdf = pages_pdf.copy()
    # epoch seconds keep the parquet/Spark timestamp round-trip exact
    pages_pdf["warc_ts_epoch"] = (
        pages_pdf["warc_ts"].astype("int64") // 10**9
    )
    pages_pdf = pages_pdf.drop(columns=["warc_ts"])
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pages_pdf, preserve_index=False),
        pages_path + ".tmp",
    )
    os.replace(pages_path + ".tmp", pages_path)
    pq.write_table(
        pa.Table.from_pandas(src_pdf, preserve_index=False),
        sources_path + ".tmp",
    )
    os.replace(sources_path + ".tmp", sources_path)
    return out


def run_once(
    docs: int, cores: int, parts: int, pin: bool = False,
    corpus_dir: str = "", cc_mode: str = "loop",
) -> dict:
    code = _RUN_SNIPPET.format(
        repo=REPO, docs=docs, cores=cores, parts=parts, corpus_dir=corpus_dir,
        cc_bound=0 if cc_mode == "loop" else None,
    )
    # pin: confine the whole process tree (JVM GC/netty/IO threads,
    # python workers, BLAS) to `cores` physical CPUs — the honest
    # analogue of an executor host that HAS only that many cores. An
    # unpinned local[2] JVM still runs 32-CPU GC + shuffle threads,
    # inflating the low-parallelism baseline.
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"run cores={cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


_ALU_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dedup.session import get_spark

spark = get_spark("alu-{cores}", master="local[{cores}]",
                  shuffle_partitions={parts})
# ALU-bound: {rows} rows from the codegen range source, {rounds} chained
# xxhash64 rounds per row — registers only, no scan, no wide shuffle
# (bit_xor partials combine map-side). If THIS scales ideally, the
# framework (task dispatch, codegen, scheduler) is not the pipeline's
# scaling limiter.
df = spark.range(0, {rows}, 1, {parts})
expr = F.col("id")
for i in range({rounds}):
    expr = F.xxhash64(expr, F.lit(i))
t0 = time.time()
row = df.select(expr.alias("h")).agg(F.bit_xor("h").alias("x")).collect()[0]
wall = time.time() - t0
print(json.dumps({{"cores": {cores}, "wall_s": wall, "x": row["x"]}}))
spark.stop()
"""


def spark_alu_control(low: int, high: int, parts: int,
                      rows: int = 4_000_000_000, rounds: int = 8) -> dict:
    """Framework-scaling control: the SAME Spark runtime executing an
    ALU-bound job at pinned `low` vs `high` cores. Near-ideal efficiency
    here isolates the dedup pipeline's lower strong-scaling number as
    memory-bus contention (CPU_CEILING.json's membw ceiling), not
    scheduler/codegen/task-dispatch overhead."""
    def one(cores: int) -> dict:
        code = _ALU_SNIPPET.format(repo=REPO, cores=cores, parts=parts,
                                   rows=rows, rounds=rounds)
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise RuntimeError(f"alu control at {cores} cores failed")
        return json.loads(out.stdout.strip().splitlines()[-1])

    lows, highs = [], []
    for _ in range(2):  # interleaved min-of-2, same as the main protocol
        lows.append(one(low))
        highs.append(one(high))
    lw = min(r["wall_s"] for r in lows)
    hw = min(r["wall_s"] for r in highs)
    assert len({r["x"] for r in lows + highs}) == 1
    eff = (lw / hw) / (high / low)
    return {
        "protocol": f"pinned local[{low}] vs local[{high}], {rows} rows x "
                    f"{rounds} chained xxhash64, interleaved min-of-2",
        "low_wall_s": round(lw, 1),
        "high_wall_s": round(hw, 1),
        "efficiency": round(eff, 3),
        "note": "Spark-framework ALU control: ideal-scaling ceiling of "
                "the runtime itself on this host; read the pipeline's "
                "strong-scaling number against min(this, membw ceiling)",
    }


def weak_scaling(docs: int, parts: int) -> dict:
    """1 pinned 2-core job vs 4 concurrent pinned 2-core jobs on
    disjoint cpusets; every job runs the identical pipeline on the
    identical (independently generated) input."""
    import concurrent.futures as cf
    import time

    code = _RUN_SNIPPET.format(
        repo=REPO, docs=docs, cores=2, parts=parts, corpus_dir="",
        cc_bound=0,
    )

    def one(cpus: str) -> dict:
        out = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, "-c", code],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise RuntimeError(f"weak-scaling run on cpus {cpus} failed")
        return json.loads(out.stdout.strip().splitlines()[-1])

    single = one("0-1")
    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        quad = list(ex.map(one, ["0-1", "2-3", "4-5", "6-7"]))
    quad_span = time.time() - t0
    assert len({r["assign_hash"] for r in quad + [single]}) == 1
    slowest = max(r["wall_s"] for r in quad)
    return {
        "protocol": "1 vs 4 fully-independent pinned 2-core jobs "
                    "(own JVM/GC/python; disjoint cpusets) — the "
                    "single-host executor analog",
        "docs_per_job": docs,
        "single_wall_s": round(single["wall_s"], 1),
        "quad_walls_s": [round(r["wall_s"], 1) for r in quad],
        "quad_span_s": round(quad_span, 1),
        "efficiency": round(single["wall_s"] / slowest, 3),
        "outputs_identical": True,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved repeats per level; min wall wins "
                         "(the sandbox host's throughput varies ~2x "
                         "between runs, so single measurements mislead)")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="fixed across both levels (cluster analogy: "
                         "partitioning doesn't change when executors "
                         "do). Default None = auto: max(high cores, "
                         "ceil(docs/125k)) — the constant-partition-"
                         "SIZE rule the 4M probe measured (dedup/"
                         "session.auto_shuffle_partitions); reproduces "
                         "the recorded protocol at every probe size "
                         "(2M→16, 4M→32)")
    ap.add_argument("--cc-mode", choices=("loop", "hybrid"), default="loop",
                    help="loop (default) forces the distributed CC star "
                         "loop — the gate measures the large-graph "
                         "regime the 10^12-doc design point runs in; "
                         "hybrid uses the production regime switch "
                         "(driver union-find below 10M edges) for "
                         "absolute-throughput rows")
    ap.add_argument("--pin", action="store_true",
                    help="taskset each run to its core budget (bounds "
                         "JVM GC/netty + python workers, like a real "
                         "N-core executor host)")
    ap.add_argument("--weak", action="store_true",
                    help="run ONLY the executor-analog weak-scaling "
                         "demo and merge it into BENCH_SCALING.json")
    ap.add_argument("--weak-docs", type=int, default=50000)
    ap.add_argument("--corpus-cache", action="store_true", default=True,
                    help="pre-generate the corpus once to parquet; every "
                         "leg reads the identical input (generation is "
                         "single-threaded driver pandas — ~10 min per "
                         "leg at 2M docs otherwise)")
    ap.add_argument("--no-corpus-cache", dest="corpus_cache",
                    action="store_false")
    ap.add_argument("--record-as", default=None,
                    help="store this run's report under the named key in "
                         "BENCH_SCALING.json (e.g. stretch_4m_auto) "
                         "instead of replacing the top-level gate row")
    ap.add_argument("--alu-control", action="store_true",
                    help="run ONLY the Spark-framework ALU-bound scaling "
                         "control and merge it into BENCH_SCALING.json")
    args = ap.parse_args()

    if args.shuffle_partitions is None:
        sys.path.insert(0, REPO)
        from dedup.session import auto_shuffle_partitions

        docs_for_sizing = args.weak_docs if args.weak else args.docs
        args.shuffle_partitions = auto_shuffle_partitions(
            docs_for_sizing, min_partitions=args.high
        )
        print(f"[auto] shuffle_partitions = {args.shuffle_partitions} "
              f"({docs_for_sizing} docs, high={args.high})",
              file=sys.stderr)

    bench_path = os.path.join(REPO, "BENCH_SCALING.json")
    if args.alu_control:
        ctl = spark_alu_control(args.low, args.high, args.shuffle_partitions)
        report = {}
        if os.path.exists(bench_path):
            with open(bench_path) as f:
                report = json.load(f)
        report["spark_alu_control"] = ctl
        print(json.dumps(ctl, indent=2))
        with open(bench_path, "w") as f:
            json.dump(report, f, indent=2)
        return
    if args.weak:
        weak = weak_scaling(args.weak_docs, args.shuffle_partitions)
        report = {}
        if os.path.exists(bench_path):
            with open(bench_path) as f:
                report = json.load(f)
        report["weak_scaling"] = weak
        print(json.dumps(weak, indent=2))
        with open(bench_path, "w") as f:
            json.dump(report, f, indent=2)
        return

    corpus_dir = ensure_corpus_cache(args.docs) if args.corpus_cache else ""
    lows, highs = [], []
    for _ in range(args.repeats):
        lows.append(
            run_once(args.docs, args.low, args.shuffle_partitions, args.pin,
                     corpus_dir, args.cc_mode)
        )
        highs.append(
            run_once(args.docs, args.high, args.shuffle_partitions, args.pin,
                     corpus_dir, args.cc_mode)
        )
    low = min(lows, key=lambda r: r["wall_s"])
    high = min(highs, key=lambda r: r["wall_s"])
    assert low["assign_rows"] == high["assign_rows"], "row count mismatch"
    assert low["assign_hash"] == high["assign_hash"], (
        "outputs differ between parallelism levels"
    )
    speedup = high["docs_per_sec"] / low["docs_per_sec"]
    ideal = args.high / args.low
    eff = speedup / ideal
    report = {
        "docs": args.docs,
        "cc_mode": args.cc_mode,
        "cpu_pinned": bool(args.pin),
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "ideal_speedup": ideal,
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
    }
    ceiling_path = os.path.join(REPO, "CPU_CEILING.json")
    if os.path.exists(ceiling_path):
        with open(ceiling_path) as f:
            ceiling = json.load(f)
        key = f"eff_{args.low}_to_{args.high}"
        report["hardware_ceiling"] = {
            "probe": "scripts/cpu_ceiling.py (Spark-free)",
            "alu_this_pair": ceiling.get("alu", {}).get(key),
            "membw_this_pair": ceiling.get("membw", {}).get(key),
            "note": "the pipeline is shuffle/cache-heavy; read its "
                    "efficiency against the membw ceiling (one shared "
                    "bus on this host; a real N->4N executor scale-up "
                    "multiplies buses)",
        }
    prev = {}
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            prev = json.load(f)
    if args.record_as:
        # side-record (e.g. a stretch probe): store the whole report
        # under the named key, leave the top-level gate row untouched
        merged = prev
        merged[args.record_as] = report
        if args.pin:
            trend = merged.setdefault("efficiency_vs_docs", {})
            trend[str(args.docs)] = report["scaling_efficiency"]
    else:
        # gate row: report becomes the top level; carry forward every
        # prior side-record key (weak_scaling, stretch_*, controls, …)
        for key, val in prev.items():
            if key not in report:
                report[key] = val
        # every pinned protocol run extends the efficiency-vs-size trend
        # (the strongest evidence that the non-scaling term is constant
        # driver wall); unpinned smoke runs stay out of it
        if args.pin:
            trend = report.setdefault("efficiency_vs_docs", {})
            trend[str(args.docs)] = report["scaling_efficiency"]
        merged = report
    print(json.dumps(report, indent=2))
    with open(bench_path, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
