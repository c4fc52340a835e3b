"""Round-4 VERDICT ask #9 evidence: run the stateful driver query N times
and grep the captured JVM/driver log for checkpoint-abort noise
(ChecksumCancellableFSDataOutputStream / ERROR CheckpointFileManager)
so a real failure cannot hide in retried-write stack traces.

Usage: python tools/stateful_noise_drill.py [repeats=5]
"""
import json
import subprocess
import sys

SNIPPET = r"""
import sys
from master_project_spark.session import get_spark
from master_project_spark.entry_queries import stateful_user_progress
spark = get_spark(8, app_name="stateful_drill")
spark.sparkContext.setLogLevel("WARN")
n_rows = 0
for i in range(int(sys.argv[1])):
    n_rows = stateful_user_progress(spark, "/root/testdata/sf0.01").count()
print("DRILL_OK rows=%d" % n_rows)
"""

NOISE_MARKERS = ("ChecksumCancellableFSDataOutputStream",
                 "is aborting.",
                 "Error writing stream metadata",
                 "ERROR CheckpointFileManager",
                 "ERROR HDFSBackedStateStoreProvider",
                 "CancellableFSDataOutputStream")

if __name__ == "__main__":
    repeats = sys.argv[1] if len(sys.argv) > 1 else "5"
    r = subprocess.run([sys.executable, "-c", SNIPPET, repeats],
                       capture_output=True, text=True)
    ok = any(ln.startswith("DRILL_OK") for ln in r.stdout.splitlines())
    noise = [ln for ln in (r.stderr + r.stdout).splitlines()
             if any(m in ln for m in NOISE_MARKERS)]
    print(json.dumps({"repeats": int(repeats), "query_ok": ok,
                      "noise_lines": len(noise),
                      "sample": noise[:3]}))
    sys.exit(0 if ok and not noise else 1)
