"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline = the KG pipeline over distributed-generated synthetic transcripts
(~10^5 turns at sf0.1 — the small-scale stand-in for the 10^12-turn corpus)
plus the heaviest operator queries from the driver contract.

Scaling evidence (north rule: N vs 4N executors >= 0.8 efficiency; sandbox
substitution local[8] vs local[32]): run `python bench.py --scaling`, which
executes the pipeline leg in two subprocesses and reports
efficiency = (turns/sec @ 32 cores) / (4 * turns/sec @ 8 cores).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HEADLINE_QUERIES = [
    "pricing_summary", "revenue_by_nation", "top_orders_per_cust",
    "running_total_per_cust", "sessionize_users", "cosine_topk",
    "minhash_band_groups", "bow_dedup_groups", "pattern_triples",
    "token_stats", "fixpoint_entities", "semantic_search_documents",
    "verified_triples",
]

SF_FROM_DIR = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}


def _force(df) -> int:
    """Execute a query fully without driver-side collect cost."""
    df.write.mode("overwrite").format("noop").save()
    return 0


#: Bucket count for --bucketed-input: FIXED (not cores-derived) so both
#: scaling legs read identically-laid-out data — the leg comparison then
#: isolates parallelism, not layout. 64 buckets = 4 tasks/core at 16 cores.
N_BUCKETS = 64


def pipeline_leg(cores: int, sf_dir: str, n_convs: int,
                 with_fixpoint: bool = False,
                 bucketed: bool = False) -> dict:
    from master_project_spark.datagen import alias_df, transcripts_df_distributed
    from master_project_spark.pipeline import run_pipeline
    from master_project_spark.session import get_spark

    out_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="bench_wh_", dir=out_base) if bucketed \
        else None
    spark = get_spark(cores, app_name=f"bench_pipeline_{cores}",
                      extra_conf={"spark.sql.warehouse.dir": wh} if wh
                      else None)
    spark.sparkContext.setLogLevel("ERROR")
    # tmpfs output: measure the pipeline, not virtio-disk writeback
    out = tempfile.mkdtemp(prefix=f"bench_kg_{cores}_", dir=out_base)
    try:
        if bucketed:
            # Production shape: transcripts arrive as a conv_id-bucketed
            # table (Iceberg bucket(conv_id) at ingest). The bucketed write
            # is UNTIMED (it happens once at ingest, amortized over every
            # downstream read); the timed pipeline then plans the chunker
            # aggregation with ZERO text shuffle (HashPartitioning(conv_id)
            # satisfies the (conv_id, seg_idx) clustering — see
            # chunk_stage_df docstring + tests/test_plans.py).
            (transcripts_df_distributed(spark, n_convs)
             .write.mode("overwrite").bucketBy(N_BUCKETS, "conv_id")
             .sortBy("conv_id", "turn_idx").format("parquet")
             .saveAsTable("bench_transcripts_bucketed"))
            transcripts = spark.table("bench_transcripts_bucketed").cache()
        else:
            transcripts = transcripts_df_distributed(spark, n_convs).cache()
        n_turns = transcripts.count()  # materialize: measure pipeline, not gen
        t0 = time.perf_counter()
        res = run_pipeline(spark, transcripts, out, alias_df(spark),
                           resume=False, with_fixpoint=with_fixpoint,
                           input_clustered=bucketed)
        n_triples = res.tables["triples"].count()
        wall = time.perf_counter() - t0
        leg = {"cores": cores, "turns": n_turns, "triples": n_triples,
               "wall_sec": round(wall, 3),
               "turns_per_sec": round(n_turns / wall, 2),
               "triples_per_sec": round(n_triples / wall, 2)}
        if bucketed:
            leg["input"] = f"bucketed{N_BUCKETS}"
        if with_fixpoint:
            by_stage = {m["stage"]: m for m in res.metrics}
            leg["fixpoint"] = {
                "stage_wall_sec": round(
                    by_stage["fixpoint_entities"]["wall_ms"] / 1000, 3),
                "embed_commit_sec": round(
                    by_stage.get("chunk_embeddings",
                                 {"wall_ms": 0})["wall_ms"] / 1000, 3),
                "entities": by_stage["fixpoint_entities"]["rows_out"],
                "chunks_embedded": by_stage.get(
                    "chunk_embeddings", {"rows_out": 0})["rows_out"],
                "convergence": json.loads(
                    by_stage["_fixpoint_convergence"]["files_json"]),
            }
        return leg
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
        if wh:
            shutil.rmtree(wh, ignore_errors=True)


def _cpu_probe() -> float:
    """Fixed single-core workload pinned to core 0 (~1 s): its rate (kH/s)
    quantifies host co-tenancy at that moment, so each scaling leg carries
    a control column separating VM weather from code (round-3 VERDICT ask
    #2 — 'quantified, not narrated')."""
    code = ("import time,hashlib\n"
            "h = b'x' * 64\n"
            "t0 = time.perf_counter()\n"
            "for i in range(300000): h = hashlib.sha256(h).digest()\n"
            "print(300000 / (time.perf_counter() - t0))")
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", "0"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True)
    try:
        return round(float(out.stdout.strip()) / 1000, 1)
    except ValueError:                               # pragma: no cover
        return -1.0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run the pipeline leg at N and 4N cores in "
                         "subprocesses and report scaling efficiency")
    ap.add_argument("--runs", type=int, default=1,
                    help="with --scaling: repeat the N/4N pair this many "
                         "times and report the full distribution + median")
    ap.add_argument("--exec-mode", choices=["local", "local-cluster"],
                    default="local",
                    help="with --scaling: 'local' = both legs single-JVM "
                         "local[N] (the round 2-4 substitution); "
                         "'local-cluster' = REAL separate executor JVMs — "
                         "local-cluster[1,N,mem] vs local-cluster[4,N,mem], "
                         "i.e. 1 vs 4 executors of N cores each, own heap/"
                         "block manager/Python worker pool per executor — "
                         "the direct test of the per-executor data plane "
                         "(round-4 VERDICT lead ask)")
    ap.add_argument("--exec-mem-mb", type=int, default=8192,
                    help="with --exec-mode local-cluster: per-worker "
                         "memory (MB); executor heap is set just below it")
    ap.add_argument("--repeat", type=int, default=3,
                    help="standard bench: sequential full repeats; the "
                         "JSON reports per-run results + medians so each "
                         "BENCH_rN.json carries its own noise bound "
                         "(round-4 VERDICT ask #5)")
    ap.add_argument("--ab-cue-gate", action="store_true",
                    help="A/B the round-3 cue-gate widening: run the "
                         "pipeline leg with the production gate and with "
                         "MPS_AB_NARROW_CUE_GATE=1 (round-2 cue-only "
                         "semantics) and report both throughputs")
    ap.add_argument("--bucketed-input", action="store_true",
                    help="materialize the transcripts as a conv_id-bucketed "
                         "table (untimed ingest write, the production "
                         "Iceberg bucket(conv_id) layout) and run the "
                         "pipeline with input_clustered=True — the chunker "
                         "aggregation then plans WITHOUT the raw-text "
                         "shuffle (the dominant cross-executor transfer; "
                         "round-5 local-cluster decomposition)")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--fixpoint", action="store_true",
                    help="run the pipeline WITH the extraction-fixpoint "
                         "stage and report its wall/rounds/embed counts "
                         "(kept out of the default bench so the headline "
                         "pipeline number stays comparable across rounds)")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--n-convs", type=int, default=None,
                    help="pipeline conversations (default scaled to sf)")
    args = ap.parse_args(argv)

    sf = SF_FROM_DIR.get(os.path.basename(args.sf_dir.rstrip("/")), 0.1)
    # ~933k turns at sf0.1 (round-2 bump from 233k): the corpus-invariant
    # overhead (per-stage snapshot commits + the CC driver loop) is ~25-30 s
    # regardless of input, so the smaller input measured commit latency,
    # not throughput — the round-1 driver bench read 2x below the recorded
    # number for exactly this reason (BENCH/BASELINE.md reconciliation)
    n_convs = args.n_convs or max(200, int(400000 * sf / 0.1))

    if args.scaling:
        # N vs 4N executors, sandbox substitution. Each leg is CPU-PINNED to
        # exactly its core budget (taskset) — at local[N] on a larger box the
        # JVM's GC/shuffle/Arrow threads would otherwise borrow idle cores,
        # which no real N-core executor has, understating the 4N leg.
        # Each leg also carries before/after single-core probe rates (kH/s)
        # as a co-tenancy control.
        n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
        runs = []
        for run_i in range(args.runs):
            legs = {}
            for cores in (n_small, 4 * n_small):
                probe_before = _cpu_probe()
                env = dict(os.environ)
                if args.exec_mode == "local-cluster":
                    n_exec = cores // n_small
                    master = (f"local-cluster[{n_exec},{n_small},"
                              f"{args.exec_mem_mb}]")
                    env["SPARK_GRAFT_MASTER"] = master
                else:
                    env.pop("SPARK_GRAFT_MASTER", None)
                cmd = [sys.executable, __file__, "--pipeline-only",
                       "--cores", str(cores), "--sf-dir", args.sf_dir,
                       "--n-convs", str(n_convs)]
                if args.bucketed_input:
                    cmd.append("--bucketed-input")
                if shutil.which("taskset"):
                    cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
                for attempt in (1, 2):    # one retry: transient JVM-start
                    r = subprocess.run(cmd, capture_output=True, text=True,
                                       env=env)
                    if r.returncode == 0:
                        break
                    print(f"# leg cores={cores} attempt {attempt} failed "
                          f"rc={r.returncode}: {r.stderr[-500:]}",
                          file=sys.stderr, flush=True)
                else:
                    raise RuntimeError(f"leg cores={cores} failed twice")
                out = r.stdout.strip().splitlines()[-1]
                legs[cores] = json.loads(out)["pipeline"]
                legs[cores]["probe_khs"] = [probe_before, _cpu_probe()]
                if args.exec_mode == "local-cluster":
                    legs[cores]["master"] = env["SPARK_GRAFT_MASTER"]
            big, small = legs[4 * n_small], legs[n_small]
            eff = big["turns_per_sec"] / (4 * small["turns_per_sec"])
            run = {"efficiency": round(eff, 3), "legs": legs}
            runs.append(run)
            print(json.dumps({"run": run_i + 1, **run}), flush=True)
        effs = sorted(r["efficiency"] for r in runs)
        median = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
        print(json.dumps({
            "metric": f"kg_pipeline_scaling_efficiency_{n_small}_to_{4 * n_small}_cores",
            "value": median, "unit": "ratio", "sf": sf,
            "exec_mode": args.exec_mode,
            "input": f"bucketed{N_BUCKETS}" if args.bucketed_input
            else "generated",
            "pinned": bool(shutil.which("taskset")),
            "runs": len(runs), "efficiencies": effs, "median": median,
            "legs": runs[-1]["legs"],
        }))
        return 0

    if args.ab_cue_gate:
        # VERDICT round-3 ask #3: price the cue-gate widening in isolation
        # — same HEAD, same input, one env flag, two subprocess legs.
        legs = {}
        for label, env_extra in (("widened", {}),
                                 ("narrow", {"MPS_AB_NARROW_CUE_GATE": "1"})):
            cmd = [sys.executable, __file__, "--pipeline-only",
                   "--cores", str(args.cores), "--sf-dir", args.sf_dir,
                   "--n-convs", str(n_convs)]
            # the widened leg must NOT inherit a stray narrow-gate flag
            # from the calling shell (ADVICE round-4): build env with the
            # flag removed, then apply this leg's extras
            env = dict(os.environ)
            env.pop("MPS_AB_NARROW_CUE_GATE", None)
            env.update(env_extra)
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, env=env).stdout.strip() \
                .splitlines()[-1]
            legs[label] = json.loads(out)["pipeline"]
        ratio = round(legs["widened"]["turns_per_sec"]
                      / legs["narrow"]["turns_per_sec"], 4)
        print(json.dumps({
            "metric": "cue_gate_widening_ab",
            "value": ratio, "unit": "widened/narrow turns_per_sec ratio",
            "sf": sf, "legs": legs}))
        return 0

    if args.pipeline_only:
        leg = pipeline_leg(args.cores, args.sf_dir, n_convs,
                           bucketed=args.bucketed_input)
        print(json.dumps({"pipeline": leg}))
        return 0

    if args.fixpoint:
        leg = pipeline_leg(args.cores, args.sf_dir, n_convs,
                           with_fixpoint=True)
        print(json.dumps({
            "metric": "kg_pipeline_with_fixpoint_wall",
            "value": leg["wall_sec"], "unit": "sec", "sf": sf,
            "pipeline": leg}))
        return 0

    # ---- standard driver-run bench: pipeline + headline operator queries,
    # repeated --repeat times so the recorded JSON carries its own noise
    # bound (per-run values + medians) — the r2->r3 and r3->r4 "slowdowns"
    # were host weather that a single sample cannot distinguish from code
    # (BENCH/BASELINE.md reconciliations; round-4 VERDICT ask #5)
    import statistics

    from master_project_spark.entry_queries import QUERIES
    from master_project_spark.session import get_spark

    rep_runs: list[dict] = []
    for _rep in range(max(1, args.repeat)):
        queries: dict[str, float] = {}
        t0 = time.perf_counter()
        leg = pipeline_leg(args.cores, args.sf_dir, n_convs)
        queries["kg_pipeline"] = round(time.perf_counter() - t0, 3)

        spark = get_spark(args.cores, app_name="bench_queries")
        spark.sparkContext.setLogLevel("ERROR")
        for name in HEADLINE_QUERIES:
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, args.sf_dir))
            queries[name] = round(time.perf_counter() - t0, 3)
        spark.stop()
        rep_runs.append({"total": round(sum(queries.values()), 3),
                         "queries": queries, "pipeline": leg,
                         "turns_per_sec": leg["turns_per_sec"],
                         "triples_per_sec": leg["triples_per_sec"]})

    med_queries = {name: round(statistics.median(
        r["queries"][name] for r in rep_runs), 3)
        for name in rep_runs[0]["queries"]}
    med_tps = round(statistics.median(
        r["turns_per_sec"] for r in rep_runs), 2)
    # representative pipeline leg: the run whose turns/s is closest to the
    # median (a real measured leg, not a synthetic mix of runs)
    rep_leg = min(rep_runs,
                  key=lambda r: abs(r["turns_per_sec"] - med_tps))["pipeline"]
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": round(statistics.median(r["total"] for r in rep_runs), 3),
        "unit": "sec",
        "queries": med_queries,
        "sf": sf,
        "pipeline": rep_leg,
        "triples_per_sec": round(statistics.median(
            r["triples_per_sec"] for r in rep_runs), 2),
        "turns_per_sec": med_tps,
        "median_turns_per_sec": med_tps,
        "repeat": len(rep_runs),
        "runs": [{"total": r["total"],
                  "turns_per_sec": r["turns_per_sec"],
                  "kg_pipeline": r["queries"]["kg_pipeline"]}
                 for r in rep_runs],
        "cores": args.cores,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
