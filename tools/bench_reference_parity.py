"""Reference-parity throughput check: word count on the reference's
largest tested workload shape.

The reference's biggest e2e input is ``big_file`` — 1025×1025 = ~1.05M
tokens (``mapreduce/tests/whitebox_tests/big_file_output:1``), run on
a 3-worker GKE cluster with every byte round-tripping through GCS and
a 1 s scheduler poll (so wall-clock there is minutes-scale by
construction; the repo publishes no numbers — BASELINE.md). This tool
re-synthesizes that input ×SCALE and measures our engine's single-node
throughput on the same query, verifying the exact golden count.

Usage: python tools/bench_reference_parity.py [SCALE]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark.functions.text import wordcount
from irio2024_mapreduce_spark.session import get_spark


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("ref-parity")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="big_file_")
    line = " ".join(["word"] * 1025) + "\n"
    n_files = scale
    for i in range(n_files):
        with open(os.path.join(workdir, f"big_file_{i}"), "w") as f:
            for _ in range(1025):
                f.write(line)
    total_tokens = 1025 * 1025 * n_files

    # warm-up
    spark.range(1_000_000).selectExpr("count(*)").collect()

    t0 = time.perf_counter()
    rows = wordcount(spark.read.text(workdir)).collect()
    elapsed = time.perf_counter() - t0

    assert rows[0]["word"] == "word" and rows[0]["cnt"] == total_tokens, rows
    print(
        json.dumps(
            {
                "workload": "reference big_file x%d" % n_files,
                "tokens": total_tokens,
                "golden_count_verified": True,
                "elapsed_sec": round(elapsed, 3),
                "tokens_per_sec": int(total_tokens / elapsed),
            }
        )
    )


if __name__ == "__main__":
    main()
