"""Pure-SQL surface demonstrations: the engine's queries are DataFrame-
first, but users of a Spark platform also write raw ``spark.sql`` — these
two queries exercise SQL-only constructs end-to-end through the same
driver gate (temp view → SQL text → Catalyst), proving the SQL entry
point gets the identical plans and answers.

- :func:`sql_value_ntiles` — ``NTILE(4)`` quartile assignment per
  event type with a total ordering (value, event_id), rolled up to per-
  (type, tile) stats. NTILE is only deterministic under a TOTAL order —
  the event_id tie-break is the contract, same as every window query
  here.
- :func:`lateral_topk_per_type` — ``LATERAL`` correlated subquery
  (Spark 4 SQL): top-3 events per type by (value DESC NULLS LAST,
  event_id). The null order is pinned on both engines (Spark and DuckDB
  disagree on defaults).

Scale: both are single-shuffle window/top-k shapes Catalyst already
plans optimally (the LATERAL decorrelates to a ranked window —
WindowGroupLimit pushes the per-group LIMIT before the final sort).

Reference scope note: the reference project (``/root/reference``,
Task2-4/Client.py) uses the DataFrame API only; this extends the SQL
entry point per SURVEY.md §7 phase 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Tables = dict[str, DataFrame]


def sql_value_ntiles(t: Tables) -> DataFrame:
    """Per-(event_type, quartile) row count and value extrema via raw SQL."""
    ev = t["events"]
    ev.createOrReplaceTempView("events_sqlapi")
    return ev.sparkSession.sql(
        """
        WITH tiled AS (
          SELECT event_type, value,
                 NTILE(4) OVER (PARTITION BY event_type
                                ORDER BY value ASC NULLS FIRST, event_id)
                   AS tile
          FROM events_sqlapi
        )
        SELECT event_type, tile,
               count(*) AS n,
               min(value) AS min_value,
               max(value) AS max_value
        FROM tiled
        GROUP BY event_type, tile
        """
    )


def lateral_topk_per_type(t: Tables) -> DataFrame:
    """Top-3 events per type via a LATERAL correlated subquery."""
    ev = t["events"]
    ev.createOrReplaceTempView("events_sqlapi")
    return ev.sparkSession.sql(
        """
        SELECT ty.event_type, l.event_id, l.value
        FROM (SELECT DISTINCT event_type FROM events_sqlapi) ty,
        LATERAL (
          SELECT event_id, value
          FROM events_sqlapi e
          WHERE e.event_type = ty.event_type
          ORDER BY value DESC NULLS LAST, event_id
          LIMIT 3
        ) l
        """
    )


QUERIES = {
    "sql_value_ntiles": sql_value_ntiles,
    "lateral_topk_per_type": lateral_topk_per_type,
}

ORACLES: dict[str, str] = {
    "sql_value_ntiles": """
        WITH tiled AS (
          SELECT event_type, value,
                 NTILE(4) OVER (PARTITION BY event_type
                                ORDER BY value ASC NULLS FIRST, event_id)
                   AS tile
          FROM events
        )
        SELECT event_type, CAST(tile AS INT) AS tile,
               CAST(count(*) AS BIGINT) AS n,
               min(value) AS min_value,
               max(value) AS max_value
        FROM tiled
        GROUP BY event_type, tile
    """,
    "lateral_topk_per_type": """
        SELECT ty.event_type, l.event_id, l.value
        FROM (SELECT DISTINCT event_type FROM events) ty,
        LATERAL (
          SELECT event_id, value
          FROM events e
          WHERE e.event_type = ty.event_type
          ORDER BY value DESC NULLS LAST, event_id
          LIMIT 3
        ) l
    """,
}
