"""Config-independence sweep: the full oracle cross-check under three
Spark configurations, one command.

Results must not depend on the partitioning or optimizer configuration
— a query whose output changes with ``spark.sql.shuffle.partitions``
or with AQE off has a nondeterminism bug (unstable ordering feeding a
limit, partial-agg float drift, etc.). Previously this was a manual
sweep recorded in COVERAGE.md; this tool makes it mechanical so each
round re-verifies HEAD.

Configs:
  1. default        — shuffle=32 (the engine's pinned default), AQE on
  2. shuffle200     — spark.sql.shuffle.partitions=200 (Spark's stock
                      default, different partition count ⇒ different
                      aggregation/join task boundaries)
  3. aqe_off        — adaptive execution fully disabled (no runtime
                      coalescing / skew splitting / join demotion)

Each config runs ``tools/check_oracle.py`` in a fresh subprocess (a
SparkSession's partitioning/AQE confs are fixed at creation — a
singleton session can't be swept in-process).

Usage: python tools/sweep_configs.py [--sf DIR] [query ...]
Prints one summary JSON line; exit 0 iff every config passes fully.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "default": {},
    "shuffle200": {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "200"},
    "aqe_off": {"SPARK_GRAFT_AQE": "0"},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    summary: dict[str, dict] = {}
    ok = True
    for cfg_name, env_over in CONFIGS.items():
        env = dict(os.environ, **env_over)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
             "--sf", args.sf, *args.names],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        m = re.match(r"(\d+)/(\d+) passed", tail)
        passed, total = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
        fails = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("FAIL")
        ]
        cfg_ok = proc.returncode == 0 and m is not None and passed == total
        ok = ok and cfg_ok
        summary[cfg_name] = {
            "passed": passed,
            "total": total,
            "ok": cfg_ok,
            "sec": round(time.time() - t0, 1),
            "failures": fails[:5],
        }
        print(
            f"[{cfg_name}] {passed}/{total} passed in "
            f"{summary[cfg_name]['sec']}s"
            + ("" if cfg_ok else f" — FAILURES: {fails[:5]}"),
            file=sys.stderr,
        )
        if proc.returncode != 0 and not fails:
            print(proc.stderr[-2000:], file=sys.stderr)

    print(json.dumps({"sf": args.sf, "configs": summary, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
