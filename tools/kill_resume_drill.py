"""Real-SIGKILL crash/resume drill (the unit tests simulate kills by
staging files; this drives the ACTUAL failure mode end to end).

Protocol: launch `run_pipeline` as a subprocess over a deterministic
input, SIGKILL -9 it mid-flight at several offsets, rerun with
resume=True after each kill, and finally diff every output table against
an uninterrupted clean run. Exercises the round-2 commit contract:
manifest invalidated before overwrite, committed == readable, partial
stages recomputed.

Usage: python tools/kill_resume_drill.py [n_convs] [kill_seconds...]
Prints one JSON line.
"""

import json
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(cmd, timeout=None, kill_after=None):
    p = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    if kill_after is None:
        return p.wait(timeout=timeout)
    time.sleep(kill_after)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
        return "killed"
    return p.returncode


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    kills = [float(x) for x in sys.argv[2:]] or [8.0, 14.0, 20.0]
    base = Path(tempfile.mkdtemp(prefix="kill_drill_", dir="/dev/shm"))
    out_k = base / "killed"
    out_c = base / "clean"
    cmd = [sys.executable, "-m", "master_project_spark.run_pipeline",
           "--n-convs", str(n_convs), "--cores", "8"]

    results = []
    try:
        for ks in kills:
            r = run(cmd + ["--out", str(out_k)], kill_after=ks)
            results.append({"kill_after_s": ks, "outcome": str(r)})
        # final uninterrupted resume completes the run
        rc = run(cmd + ["--out", str(out_k)], timeout=600)
        # clean reference run
        run(cmd + ["--out", str(out_c)], timeout=600)

        from master_project_spark.session import get_spark
        spark = get_spark(8, app_name="drill_diff")
        spark.sparkContext.setLogLevel("ERROR")
        tables = ["triples", "mentions", "verified_triples",
                  "linked_mentions", "chunks", "corpus", "conv_stats",
                  "nodes", "edges", "entity_map", "processed_convs"]
        diffs = {}
        for t in tables:
            a = spark.read.parquet(str(out_k / t)).drop("batch")
            b = spark.read.parquet(str(out_c / t)).drop("batch")
            sym = a.exceptAll(b).count() + b.exceptAll(a).count()
            diffs[t] = sym
        spark.stop()
        ok = all(v == 0 for v in diffs.values())
        print(json.dumps({
            "metric": "kill_resume_drill", "n_convs": n_convs,
            "kills": results, "final_rc": rc,
            "table_row_diffs_vs_clean": diffs, "all_tables_equal": ok,
        }))
        return 0 if ok else 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
