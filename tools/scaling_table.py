"""Render the BENCH/BASELINE.md scaling table from a `bench.py --scaling
--runs K` log: per-run raw efficiency plus per-leg throughput and the
before/after single-core CPU-probe rates (kH/s) as the co-tenancy
context columns (quiet host: ~1500-1850). The probes sample the minutes
AROUND each leg, not during it, so they are weather context, not a
normalization factor.

Usage: python tools/scaling_table.py /tmp/scaling_r4.log [more logs...]
"""
import json
import statistics
import sys

if __name__ == "__main__":
    runs = []
    for path in sys.argv[1:]:
        for ln in open(path):
            ln = ln.strip()
            if not ln.startswith("{"):         # logs may interleave
                continue                       # Spark/bench progress lines
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            if "run" in d:
                runs.append(d)
    # derive the two leg keys from the log itself (ADVICE round-4: bench.py
    # derives legs from SPARK_GRAFT_SCALE_N, so '4'/'16' must not be
    # hardcoded)
    k_small, k_big = sorted(runs[0]["legs"].keys(), key=int)
    print(f"| run | t/s @{k_small} | probe @{k_small} (kH/s) "
          f"| t/s @{k_big} | probe @{k_big} (kH/s) | efficiency |")
    print("|---|---|---|---|---|---|")
    raw = []
    for i, d in enumerate(runs, 1):
        l4, l16 = d["legs"][k_small], d["legs"][k_big]
        raw.append(d["efficiency"])
        print(f"| {i} | {l4['turns_per_sec']:,.0f} | "
              f"{l4['probe_khs'][0]:.0f}→{l4['probe_khs'][1]:.0f} | "
              f"{l16['turns_per_sec']:,.0f} | "
              f"{l16['probe_khs'][0]:.0f}→{l16['probe_khs'][1]:.0f} | "
              f"{d['efficiency']:.3f} |")
    print()
    print(f"median = {statistics.median(raw):.3f} over {len(runs)} runs; "
          f"best-conditions = {max(raw):.3f}")
