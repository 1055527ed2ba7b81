"""Python extension points: UDTF (table functions) and grouped-agg UDAF.

The reference has no UDAF or UDTF (SURVEY.md §2.8: "No UDAF, no UDTF");
this closes both gaps with oracle-checked semantics:

- a lateral-join bigram expander UDTF — one input row fans out to
  (pos, bigram) rows, arrow-batched in the Python worker. For pure string
  ops the built-in ``posexplode(transform(...))`` composition is faster
  (and is what the shingle code in ``operators/dedup.py`` uses) — the UDTF
  exists to prove the extension point.
- a grouped-aggregate pandas UDAF (``geomean_value_by_type``) — Series →
  scalar per group, the Spark-4 UDAF surface. Each group's values arrive
  as one Arrow batch; the numpy reduction runs post-shuffle, so the plan
  shape is the same single groupBy exchange a built-in aggregate gets
  (partial aggregation isn't available to grouped-agg UDFs — use built-ins
  when the reduction is expressible; this is the escape hatch for when it
  isn't).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

Tables = dict[str, DataFrame]


def _register_bigrams(spark) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class BigramUDTF:
        def eval(self, text: str):
            ws = text.strip().split()
            for i in range(len(ws) - 1):
                yield i + 1, f"{ws[i]} {ws[i + 1]}"

    spark.udtf.register("bigrams", BigramUDTF)


def bigrams_udtf(t: Tables) -> DataFrame:
    """Lateral join each document against the bigram UDTF."""
    spark = t["documents"].sparkSession
    _register_bigrams(spark)
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM documents d, LATERAL bigrams(d.text) b
        """
    )


@F.pandas_udf(DoubleType())
def _geomean(v: pd.Series) -> float:
    # numpy's pairwise-summation mean vs the oracle's sequential avg can
    # differ ~1e-13 relative; with round(...,6) on O(1) values the flip
    # probability is ~1e-7 per group — accepted (exact parity would need
    # per-element-ordered accumulation on both engines).
    import numpy as np

    pos = v[v > 0]
    if not len(pos):
        return None  # all-nonpositive group: NULL, matching SQL's FILTERed avg
    return float(np.exp(np.log(pos.to_numpy(dtype="float64")).mean()))


def geomean_value_by_type(t: Tables) -> DataFrame:
    """Geometric mean of positive event values per event type — a custom
    aggregate no built-in covers, as a grouped-agg pandas UDAF."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(F.round(_geomean("value"), 6).alias("geo_mean_value"))
    )


ORACLES: dict[str, str] = {
    "geomean_value_by_type": """
        SELECT event_type,
               round(exp(avg(ln(value)) FILTER (WHERE value > 0)), 6)
                 AS geo_mean_value
        FROM events
        GROUP BY event_type
    """,
    "bigrams_udtf": """
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents
        )
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                 i -> {'pos': CAST(i AS INTEGER),
                       'bigram': ws[i] || ' ' || ws[i + 1]}),
                 recursive := true)
        FROM w
    """,
}

QUERIES = {
    "bigrams_udtf": bigrams_udtf,
    "geomean_value_by_type": geomean_value_by_type,
}
