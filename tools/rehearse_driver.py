#!/usr/bin/env python
"""Driver-gate rehearsal at the driver's OWN scale factor (sf0.01).

tests/test_oracle_parity.py runs the full surface at sf0.001 (fast CI);
the external driver verifies at sf0.01, where scale-dependent behavior
(percentile interpolation, cap thresholds, empty-result edges) can differ.
This script replays the exact driver comparison — row count, column set,
order-insensitive canonical values — for a chosen slice of the registry at
sf0.01, so surprises surface before the driver runs.

    python tools/rehearse_driver.py              # first 50 (driver budget)
    python tools/rehearse_driver.py all          # whole registry
    python tools/rehearse_driver.py name1 name2  # specific queries
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from streamming_processing_pyspark_spark.registry import build_oracles, build_queries
from streamming_processing_pyspark_spark.session import get_spark
from streamming_processing_pyspark_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_REHEARSE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    queries = build_queries()
    oracles = build_oracles()
    args = sys.argv[1:]
    if args == ["all"]:
        names = list(queries)
    elif args:
        names = args
    else:
        names = list(queries)[:50]

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "tests"))
    from tests.conftest import assert_frames_match

    spark = get_spark(app_name="rehearse", shuffle_partitions=32)
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed = []
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, SF_DIR).toPandas()
            if name in oracles:
                oracle_pdf = duck.execute(oracles[name]).df()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                status = f"ok    rows={len(spark_pdf)}"
            else:
                status = f"rows-only rows={len(spark_pdf)}"
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            failed.append(name)
            status = f"FAIL  {type(e).__name__}: {str(e)[:300]}"
            traceback.print_exc(limit=3)
        print(f"{name:40s} {time.time() - t0:6.1f}s {status}", flush=True)

    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
