"""Cross-batch stateful trend detection — applyInPandasWithState.

The reference's Task4 detects a trend only when window W and window W−10min
are updated in the *same* micro-batch (update-mode self-join inside
foreachBatch — SURVEY.md §3.2 step 4). This operator keeps per-key window
counts in state, so a trend is detected regardless of how file arrival
slices the data across batches — the deterministic semantics the reference
lacked, kept as a separate operator so reference-compat per-batch detection
(streaming/jobs.detect_trends_in_batch) remains available.

Emission is at-most-once per (key, window): a window is emitted the first
time the trend condition becomes true for it. State is bounded by eviction:
windows older than ``retention_windows`` behind the max seen window are
dropped (the watermark analogue for this hand-rolled state).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("window_start", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("prev_cnt", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("emitted", T.ArrayType(T.LongType())),
    ]
)


def make_trend_fn(
    window_seconds: int = 600, min_count: int = 10, retention_windows: int = 1000
):
    def fn(key, pdf_iter: Iterator, state) -> Iterator:
        import pandas as pd

        if state.exists:
            starts, counts, emitted = state.get
            windows = dict(zip(starts, counts))
            emitted_set = set(emitted)
        else:
            windows, emitted_set = {}, set()

        for pdf in pdf_iter:
            secs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
            for s in secs:
                w = int(s // window_seconds * window_seconds)
                windows[w] = windows.get(w, 0) + 1

        out = []
        for w, c in sorted(windows.items()):
            prev = windows.get(w - window_seconds)
            if (
                prev is not None
                and w not in emitted_set
                and c >= min_count
                and c - prev >= prev
            ):
                emitted_set.add(w)
                out.append((key[0], w, c, prev))

        if windows:
            horizon = max(windows) - retention_windows * window_seconds
            windows = {w: c for w, c in windows.items() if w >= horizon}
            emitted_set = {w for w in emitted_set if w >= horizon}
        state.update(
            (list(windows), [windows[w] for w in windows], list(emitted_set))
        )
        if out:
            yield pd.DataFrame(out, columns=["key", "window_start", "cnt", "prev_cnt"])

    return fn


def trending_stateful(
    keyed: DataFrame,
    key_col: str = "headquarters",
    ts_col: str = "dropoff_ts",
    window_seconds: int = 600,
    min_count: int = 10,
) -> DataFrame:
    """Cross-batch trending over a keyed event stream.

    ``keyed`` must have ``key_col`` and timestamp ``ts_col``; output rows are
    (key, window_start(ts), cnt, prev_cnt) emitted when the trend condition
    first becomes true for that window.
    """
    prepared = keyed.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
    result = prepared.groupBy("key").applyInPandasWithState(
        make_trend_fn(window_seconds, min_count),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return result.select(
        "key",
        F.timestamp_seconds("window_start").alias("window_start"),
        "cnt",
        "prev_cnt",
    )


class StatefulApiUnavailable(RuntimeError):
    """transformWithState's Python-side dependencies are missing."""


def _trend_core(windows: dict, emitted_set: set, window_seconds: int,
                min_count: int, retention_windows: int):
    """Shared detection + eviction logic for both stateful APIs."""
    out = []
    for w, c in sorted(windows.items()):
        prev = windows.get(w - window_seconds)
        if (
            prev is not None
            and w not in emitted_set
            and c >= min_count
            and c - prev >= prev
        ):
            emitted_set.add(w)
            out.append((w, c, prev))
    if windows:
        horizon = max(windows) - retention_windows * window_seconds
        windows = {w: c for w, c in windows.items() if w >= horizon}
        emitted_set = {w for w in emitted_set if w >= horizon}
    return out, windows, emitted_set


def trending_stateful_tws(
    keyed: DataFrame,
    key_col: str = "headquarters",
    ts_col: str = "dropoff_ts",
    window_seconds: int = 600,
    min_count: int = 10,
    retention_windows: int = 1000,
) -> DataFrame:
    """:func:`trending_stateful` on ``transformWithStateInPandas`` — the
    Spark 4 stateful-processor API (successor to applyInPandasWithState).

    Same semantics, modern machinery: state lives in named ValueState on a
    StatefulProcessor handle (composable with timers/TTL; RocksDB-backed on
    a cluster), instead of a single implicit GroupState tuple. Both
    variants share ``_trend_core``; a test asserts identical output.

    Requires ``protobuf`` (the TWS state-server protocol) and the RocksDB
    state store provider; fails fast with an actionable error when the
    Python dependency is absent (as in this container — the
    applyInPandasWithState variant above has no such dependency).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise StatefulApiUnavailable(
            "transformWithStateInPandas needs the 'protobuf' package for its "
            "state-server protocol; pip install protobuf (and set "
            "spark.sql.streaming.stateStore.providerClass to "
            "RocksDBStateStoreProvider). Use trending_stateful() as the "
            "dependency-free equivalent."
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TrendProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("trend", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            if self._state.exists():
                got = self._state.get()
                windows = dict(zip(got[0], got[1]))
                emitted_set = set(got[2])
            else:
                windows, emitted_set = {}, set()
            for pdf in rows:
                secs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
                for s in secs:
                    w = int(s // window_seconds * window_seconds)
                    windows[w] = windows.get(w, 0) + 1
            out, windows, emitted_set = _trend_core(
                windows, emitted_set, window_seconds, min_count, retention_windows
            )
            self._state.update(
                (list(windows), [windows[w] for w in windows], list(emitted_set))
            )
            if out:
                yield pd.DataFrame(
                    [(key[0], w, c, p) for (w, c, p) in out],
                    columns=["key", "window_start", "cnt", "prev_cnt"],
                )

        def close(self) -> None:
            pass

    prepared = keyed.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
    result = prepared.groupBy("key").transformWithStateInPandas(
        statefulProcessor=TrendProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    return result.select(
        "key",
        F.timestamp_seconds("window_start").alias("window_start"),
        "cnt",
        "prev_cnt",
    )
