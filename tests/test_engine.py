"""Engine facade: the migration surface a reference user would drive."""

from __future__ import annotations

import os

from streamming_processing_pyspark_spark.engine import Engine

from .conftest import SF_DIR
from .taxi_fixture import default_plan, write_taxi_files


def test_engine_end_to_end_task2(spark, tmp_path):
    eng = Engine(spark, sf_dir=SF_DIR)
    d = str(tmp_path / "taxi")
    out = str(tmp_path / "out")
    write_taxi_files(d, default_plan())

    trips = eng.taxi_trips(d)
    assert trips.count() == 7

    q = eng.stream_hourly_to_files(d, out)
    q.processAllAvailable()
    q.stop()
    assert sorted(os.listdir(out)) == ["output-3960000", "output-4320000"]

    assert "q1_pricing_summary" in eng.list_queries()
    assert eng.query("hourly_counts").count() > 0
    assert eng.oracle("hourly_counts") is not None
    assert eng.oracle("simhash_fingerprints") is None

    eng.tables()
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0


def test_cli_list_and_oracle(capsys):
    from streamming_processing_pyspark_spark.__main__ import main

    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "hourly_counts" in names and "ngram_jaccard_pairs" in names
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "lineitem" in capsys.readouterr().out
    assert main(["oracle", "minhash_lsh_pairs"]) == 0
    assert "rows-only" in capsys.readouterr().out


def test_registry_outputs_are_driver_safe_scalars(spark):
    """VERDICT r8 §2 (registry lint): the driver's canonicalizer sorts
    result frames by every column, so a nested column (array/map/struct)
    in ANY registered query's output crashes the slate row (the r8
    embedding_whiten_audit failure). Walk the whole registry at sf0.001
    and assert every output field is an atomic type. A query may only
    escape via the explicit whitelist below, which requires a documented
    rows-only contract AND a scalar _check twin — currently empty."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from streamming_processing_pyspark_spark.registry import build_queries

    # name -> reason; empty on purpose: anything added here must carry a
    # rows-only contract in its docstring and a scalar *_check twin
    whitelist: dict[str, str] = {}

    offenders = {}
    for name, fn in sorted(build_queries().items()):
        if name in whitelist:
            continue
        df = fn(spark, SF_DIR)
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, f"nested output columns would crash the driver canonicalizer: {offenders}"


def test_check_order_front_loads_changed_sources(monkeypatch):
    """VERDICT r9 §4: a query whose implementation changed since its
    last driver check (source hash ≠ committed receipt) must sort ahead
    of every unchanged query, regardless of how many green rows it has;
    queries with no receipt (new ops) keep their fewest-green rank."""
    from streamming_processing_pyspark_spark import registry as R

    hashes = R.query_source_hashes()
    names = sorted(hashes)
    # the most-checked query in the registry, with a deliberately stale
    # receipt; everything else gets its true current hash
    counts, _ = R._checked_row_counts()
    most_checked = max(names, key=lambda n: counts.get(n, 0))
    fake = {n: hashes[n] for n in names}
    fake[most_checked] = "stale-sentinel"
    monkeypatch.setattr(R, "_source_receipts", lambda: fake)
    order = R.check_order(list(names), hashes)
    assert order[0] == most_checked

    # the changed-source invariant, pinned on CONSTRUCTED receipts
    # rather than a live-round snapshot (the r10 form hardcoded
    # resize_plan's state and went stale the moment r11's receipt stamp
    # ran): fresh receipt + untouched source is never flagged, a stale
    # receipt is, and a receiptless (new) query is not.
    a, b = names[0], names[1]
    monkeypatch.setattr(
        R,
        "_source_receipts",
        lambda: {a: hashes[a], b: "stale-sentinel"},
    )
    assert R._changed_since_receipt(hashes) == {b}
    # live-file structural sanity: only receipt-bearing queries can be
    # flagged (never a new op with no receipt)
    monkeypatch.undo()
    assert R._changed_since_receipt(hashes) <= set(R._source_receipts())
