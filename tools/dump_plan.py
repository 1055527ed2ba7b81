#!/usr/bin/env python
"""Dump .explain("formatted") for queries to plans/<round>/<query>_<tag>.txt.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/dump_plan.py \
        --out plans/r12 --tag before query_a query_b ...
"""

from __future__ import annotations

import os
import sys

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from streamming_processing_pyspark_spark.registry import build_queries
from streamming_processing_pyspark_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    out_dir, tag, names = "plans/r12", "after", []
    it = iter(args)
    for a in it:
        if a == "--out":
            out_dir = next(it)
        elif a == "--tag":
            tag = next(it)
        else:
            names.append(a)
    os.makedirs(os.path.join(ROOT, out_dir), exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plan")
    queries = build_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(ROOT, out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
