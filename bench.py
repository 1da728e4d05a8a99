"""Benchmark runner: every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <warm total sec>, "unit": "sec",
   "queries": {"q01_...": warm sec, ...}, "cold_queries": {...},
   "cold_total": sec, "sf": 0.1}

Each query runs twice in the same warmed session: the first run pays
one-time costs (file listing, plan compilation, codegen), the second
is steady-state. ``queries``/``value`` report the WARM run — the
number that tracks real plan regressions round-over-round — and
``cold_queries``/``cold_total`` keep the first-run cost attributable.

Timing forces full materialization via the noop sink (no driver
collect overhead, no column-pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from ursa_major_choir_etl_spark.plans.queries import QUERIES
    from ursa_major_choir_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/codegen warm-up on a trivial action so q01 isn't taxed for it.
    spark.range(1000).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "warm wall-clock over all registry queries",
                "value": round(sum(warm.values()), 3),
                "unit": "sec",
                "queries": warm,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
