"""Positional ragged-CSV binding + trips normalization (SURVEY.md §1.3)."""

from __future__ import annotations

from streamming_processing_pyspark_spark.sources.taxi_csv import (
    UNION_SCHEMA,
    normalize_trips,
    read_taxi_csv,
)

from .taxi_fixture import (
    CITIGROUP_INSIDE,
    default_plan,
    green_row,
    write_taxi_files,
    yellow_row,
)


def test_union_schema_shape():
    assert len(UNION_SCHEMA.fields) == 24
    assert UNION_SCHEMA.fieldNames()[3] == "Lpep_dropoff_datetime"


def test_positional_binding(spark, tmp_path):
    """Green coords land at positions 9-10, yellow at 11-12; type-mismatched
    fields null out (PERMISSIVE semantics are part of the contract)."""
    d = str(tmp_path / "taxi")
    write_taxi_files(
        d,
        [
            (
                "mix.csv",
                [
                    yellow_row("2015-12-01 08:29:00", -73.94, 40.805),
                    green_row("2015-12-01 08:29:03", -74.0095, 40.7128),
                ],
            )
        ],
    )
    rows = {r["type"]: r for r in read_taxi_csv(spark, d).collect()}

    y = rows["yellow"]
    assert y["Yellow_Dropoff_longitude"] == -73.94
    assert y["Yellow_Dropoff_latitude"] == 40.805
    # yellow position 9 is ratecode int "1" -> Green_Dropoff_longitude 1.0;
    # position 10 is store_fwd "N" -> null under DoubleType
    assert y["Green_Dropoff_latitude"] is None
    # yellow's trip_distance "2.30" under RateCodeID int -> null
    assert y["RateCodeID"] is None

    g = rows["green"]
    assert g["Green_Dropoff_longitude"] == -74.0095
    assert g["Green_Dropoff_latitude"] == 40.7128
    # green has 22 fields -> the 24-col union's last two columns null-pad
    # (green's own payment/trip_type land at union positions 20-21, which
    # are "garbage for at least one row type" per FIXTURES.md §2)
    assert g["Payment_type"] is None
    assert g["Trip_type"] is None
    assert g["Total_amount"] == 1.0  # green payment "1" under Total_amount
    # both formats share position 4: the drop-off timestamp
    assert y["Lpep_dropoff_datetime"] is not None
    assert g["Lpep_dropoff_datetime"] is not None


def test_normalize_trips_coalesces_by_type(spark, tmp_path):
    d = str(tmp_path / "taxi")
    write_taxi_files(d, default_plan())
    trips = normalize_trips(read_taxi_csv(spark, d))
    assert trips.columns == ["type", "dropoff_ts", "dropoff_lon", "dropoff_lat"]
    got = {
        (r["type"], r["dropoff_lon"], r["dropoff_lat"])
        for r in trips.collect()
        if (r["dropoff_lon"], r["dropoff_lat"]) == CITIGROUP_INSIDE
    }
    # citigroup point appears via both yellow and green rows
    assert ("yellow", *CITIGROUP_INSIDE) in got
    assert ("green", *CITIGROUP_INSIDE) in got
    assert trips.where("dropoff_ts IS NULL").count() == 0
