"""A/B the two distributed formulations of 30-min-gap sessionization
at N× events (default 100×): Spark's native ``session_window``
aggregate vs the gaps-and-islands form (lag → new-session flag →
running session ordinal → groupBy), which trades the session-merge
aggregate for one exchange + one in-partition sort + two window
passes.

Both forms implement the same closed-interval merge semantics
(an event exactly `gap` after the previous one still merges — Spark
merges when next.start <= prev.end; islands uses `> gap` to flag).
Result parity is asserted on the full output (sorted collect compare
at 1×, count + per-user aggregate hash at N×) before timing, so the
numbers compare equal plans, not approximately-equal ones.

Usage: python tools/stress_session_forms.py [N]   (default 100)
Prints one JSON line; alternating min-of-2 per form (the SCALE.md
round-5 protocol — single-shot numbers at this scale swing with
driver/page-cache state).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.events import (
    event_session,
    event_session_islands as session_islands,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from tools.stress_scale import build_scaled_relational


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-session-forms")
    spark.sparkContext.setLogLevel("ERROR")

    # parity at 1× on the full output (cheap: ~14k session rows)
    a = sorted(map(tuple, event_session(spark, base).collect()))
    b = sorted(map(tuple, session_islands(spark, base).collect()))
    assert a == b, f"forms disagree at 1x: {len(a)} vs {len(b)} rows"

    stage = build_scaled_relational(spark, base, n)
    # parity at N× without collecting N× rows: count + summed aggregate
    pa = event_session(spark, stage).agg(
        F.count("*"), F.sum("n_events"), F.round(F.sum("sum_value"), 0)
    ).collect()[0]
    pb = session_islands(spark, stage).agg(
        F.count("*"), F.sum("n_events"), F.round(F.sum("sum_value"), 0)
    ).collect()[0]
    assert tuple(pa) == tuple(pb), (tuple(pa), tuple(pb))

    forms = {
        "session_window": lambda: event_session(spark, stage),
        "islands": lambda: session_islands(spark, stage),
    }
    times: dict[str, list[float]] = {k: [] for k in forms}
    for _ in range(2):  # alternating min-of-2
        for name, fn in forms.items():
            drain_driver_backlog(spark)
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "scale": n,
                "times": times,
                "min": {k: min(v) for k, v in times.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
