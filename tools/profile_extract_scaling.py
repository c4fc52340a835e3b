"""Isolate raw extraction scaling: mapInPandas + count, no writes."""
import json
import subprocess
import sys

SNIPPET = r"""
import time, sys, json
from master_project_spark.session import get_spark
from master_project_spark.datagen import transcripts_df_distributed
from master_project_spark.udfs import EXTRACTED_SCHEMA, extract_turn_batches
cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(cores, app_name=f"x{cores}"); spark.sparkContext.setLogLevel("ERROR")
t = transcripts_df_distributed(spark, n).cache(); nt = t.count()
# warm the python workers + cache
t.limit(1).count()
t0 = time.perf_counter()
out = (t.select("conv_id","turn_idx","ts","text")
        .repartition(cores*2, "conv_id","turn_idx")
        .mapInPandas(extract_turn_batches, EXTRACTED_SCHEMA)).count()
w = time.perf_counter()-t0
print("XPROF " + json.dumps({"cores": cores, "turns": nt, "rows": out, "wall": round(w,2), "tps": round(nt/w,1)}))
"""

if __name__ == "__main__":
    n = sys.argv[1] if len(sys.argv) > 1 else "400000"
    for cores in ("8", "32"):
        r = subprocess.run([sys.executable, "-c", SNIPPET, cores, n],
                           capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("XPROF")]
        print(line[-1] if line else r.stderr[-300:])
