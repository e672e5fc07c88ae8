#!/usr/bin/env python
"""Round-12 optimization measurement harness.

For each named query: capture the ``.explain("formatted")`` plan into
``plans/r12/<query>_<tag>.txt`` and time the noop-sink execution with
the same interleaved best-of-N + sub-second micro-rep protocol as
bench.py, so isolated before/after numbers are comparable with the
committed BENCH_stats snapshots.

Usage:
  python tools/opt_measure.py --tag before --reps 5 q1 q2 ...
  python tools/opt_measure.py --tag after  --reps 5 q1 q2 ...
  python tools/opt_measure.py --time-only --reps 5 q1 ...   (no plan files)
  python tools/opt_measure.py --plan-only q1 ...            (no timing)

Respects $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="before|after: plan file suffix")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(repo, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    from flink_tornadovm_artifact_spark.queries import QUERIES
    from flink_tornadovm_artifact_spark.session import get_spark

    names = list(args.queries)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt_measure")

    if args.tag and not args.time_only:
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(explain_str(df))
            print(f"plan -> {path}", file=sys.stderr)

    if args.plan_only:
        return

    # Warm codegen/JIT at the smallest sf (bench.py protocol).
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    MICRO_REPS, MICRO_CUTOFF_S = 3, 1.0

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    rep_times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"opt_measure:{name}")
            t = run_once(name)
            if t < MICRO_CUTOFF_S:
                t = min([t] + [run_once(name) for _ in range(MICRO_REPS - 1)])
            rep_times[name].append(t)
            spark.sparkContext.setJobDescription(None)

    stats = {
        n: {
            "best": round(min(ts), 3),
            "median": round(sorted(ts)[len(ts) // 2], 3),
            "spread": round(max(ts) - min(ts), 3),
        }
        for n, ts in rep_times.items()
    }
    print(json.dumps({"stats": stats, "sf_dir": sf_dir, "n": args.reps}))


if __name__ == "__main__":
    main()
