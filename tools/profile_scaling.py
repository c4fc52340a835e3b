"""Find the non-scaling component: per-stage walls at two core counts."""
import subprocess
import sys
import time

SNIPPET = r"""
import time, tempfile, json, sys
from master_project_spark.session import get_spark
from master_project_spark.datagen import alias_df, transcripts_df_distributed
from master_project_spark.pipeline import run_pipeline
cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(cores, app_name=f"prof{cores}"); spark.sparkContext.setLogLevel("ERROR")
t = transcripts_df_distributed(spark, n).cache(); t.count()
t0 = time.perf_counter()
res = run_pipeline(spark, t, tempfile.mkdtemp(), alias_df(spark), resume=False)
total = time.perf_counter() - t0
out = {m["stage"]: round(m["wall_ms"]/1000, 2) for m in res.metrics}
out["_total"] = round(total, 2)
print("PROFILE " + json.dumps(out))
"""

if __name__ == "__main__":
    n = sys.argv[1] if len(sys.argv) > 1 else "400000"
    for cores in ("32", "8"):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", SNIPPET, cores, n],
                           capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("PROFILE")]
        print(cores, "cores:", line[-1] if line else r.stderr[-500:])
