"""Z-order vs linear layout on REAL data: rewrite sf0.1 lineitem
(600k rows) clustered three ways and measure file-level pruning for
single-axis and rectangle range predicates from parquet footers
(`layout.pruning_stats` — the same min/max decision a stats-honoring
scan makes). Writes one JSON line; artifact recorded as
tools/stress_zorder_r{N}.json.

Axes chosen to mirror the 100 TB corpus-query story: l_orderkey
(time-ish monotone id — "recent slice"), l_partkey (entity id —
"docs for this shard/source"), l_extendedprice (score-like —
"quality band"). Predicates take a ~5% slice of each.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark.session import get_spark  # noqa: E402
from irio2024_mapreduce_spark.sources.layout import (  # noqa: E402
    pruning_stats,
    write_zordered,
)

N_FILES = 64
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COLS = ["l_orderkey", "l_partkey", "l_extendedprice"]


def slab(df, col, lo_q=0.50, hi_q=0.55):
    lo, hi = df.approxQuantile(col, [lo_q, hi_q], 1e-4)
    return (float(lo), float(hi))


def main() -> None:
    spark = get_spark("stress-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    slabs = {c: slab(df, c) for c in COLS}

    work = tempfile.mkdtemp(prefix="zorder_probe_")
    layouts = {}
    lin = os.path.join(work, "linear")
    (
        df.repartitionByRange(N_FILES, COLS[0])
        .sortWithinPartitions(COLS[0])
        .write.parquet(lin)
    )
    layouts["linear_" + COLS[0]] = lin
    zee = os.path.join(work, "zorder")
    write_zordered(df, zee, COLS, n_files=N_FILES)
    layouts["zorder_3d"] = zee

    out: dict = {"sf": SF_DIR, "n_files": N_FILES, "cols": COLS,
                 "layouts": {}}
    rect = {c: slabs[c] for c in COLS}
    for name, path in layouts.items():
        r = {
            c: round(pruning_stats(path, {c: slabs[c]})["frac_skipped"], 4)
            for c in COLS
        }
        r["rectangle_all3"] = round(
            pruning_stats(path, rect)["frac_skipped"], 4
        )
        rows = spark.read.parquet(path).count()
        out["layouts"][name] = {"rows": rows, "frac_skipped": r}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
