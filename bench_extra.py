"""Supplementary measurements for OPTIMIZATION_r06.md (bench.py is frozen
for the driver; this file holds the noop-sink isolation runs, the pipeline
per-stage breakdown, and the explain captures the guide's §1 asks for).

Usage:
  python bench_extra.py stages          # kg_pipeline per-stage wall_ms
  python bench_extra.py queries [name]  # per-query noop timing (median of 3)
  python bench_extra.py explain <name>  # write plans/r06/<name>_<tag>.txt
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(name):
    from master_project_spark.session import get_spark
    s = get_spark(CPUS, app_name=name)
    s.sparkContext.setLogLevel("ERROR")
    return s


def stages(n_convs: int = 400000) -> None:
    from master_project_spark.datagen import alias_df, transcripts_df_distributed
    from master_project_spark.pipeline import run_pipeline
    spark = _spark("bench_extra_stages")
    out_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix="bx_stages_", dir=out_base)
    try:
        t = transcripts_df_distributed(spark, n_convs).cache()
        n = t.count()
        t0 = time.perf_counter()
        res = run_pipeline(spark, t, out, alias_df(spark), resume=False)
        n_triples = res.tables["triples"].count()
        wall = time.perf_counter() - t0
        rows = [(m["stage"], round(m["wall_ms"] / 1000, 3), m["rows_out"])
                for m in res.metrics]
        print(json.dumps({"turns": n, "triples": n_triples,
                          "wall_sec": round(wall, 3),
                          "stages": rows}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def queries(only: str | None = None, repeat: int = 3) -> None:
    from master_project_spark.entry_queries import QUERIES
    from bench import HEADLINE_QUERIES
    spark = _spark("bench_extra_queries")
    names = [only] if only else HEADLINE_QUERIES
    out = {}
    for name in names:
        samples = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.mode("overwrite") \
                .format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": statistics.median(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


def explain(name: str, tag: str) -> None:
    from master_project_spark.entry_queries import QUERIES
    spark = _spark("bench_extra_explain")
    df = QUERIES[name](spark, SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = f"plans/r06/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "stages":
        stages(int(sys.argv[2]) if len(sys.argv) > 2 else 400000)
    elif cmd == "queries":
        queries(sys.argv[2] if len(sys.argv) > 2 else None)
    elif cmd == "explain":
        explain(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "before")
    else:
        sys.exit(__doc__)
