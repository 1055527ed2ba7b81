"""Synthetic ragged taxi CSV fixture — FIXTURES.md §1 row formats.

Generates deterministic yellow (20-field) and green (22-field) rows mixed in
minute files, with drop-off points placed inside/outside the reference
geofences. Independent of the reference's data files.
"""

from __future__ import annotations

import os

# points chosen against the ray-cast semantics (tests cross-check vs numpy)
CITIGROUP_INSIDE = (-74.0110, 40.7209)
GOLDMAN_INSIDE = (-74.0141, 40.7147)
OUTSIDE = (-73.98, 40.75)


def yellow_row(dropoff_ts: str, lon: float, lat: float) -> str:
    return (
        f"yellow,1,2015-12-01 08:00:00,{dropoff_ts},1,2.30,"
        f"-73.9668,40.7934,1,N,{lon},{lat},2,14,0,0.5,0,0,0.3,14.8"
    )


def green_row(dropoff_ts: str, lon: float, lat: float) -> str:
    return (
        f"green,2,2015-12-01 08:00:00,{dropoff_ts},N,1,"
        f"-73.9837,40.6944,{lon},{lat},1,2.18,9,0,0.5,1.96,0,,0.3,11.76,1,1"
    )


def write_taxi_files(out_dir: str, plan: list[tuple[str, list[str]]]) -> list[str]:
    """plan: [(file_name, [row, ...]), ...] → writes files, returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fname, rows in plan:
        p = os.path.join(out_dir, fname)
        with open(p, "w") as f:
            f.write("\n".join(rows) + "\n")
        paths.append(p)
    return paths


def default_plan() -> list[tuple[str, list[str]]]:
    """3 minute-files spanning two hours and both geofences.

    Hour 10: 4 drop-offs (2 citigroup, 1 goldman, 1 outside).
    Hour 11: 3 drop-offs (1 citigroup, 2 outside).
    """
    ci, go, out = CITIGROUP_INSIDE, GOLDMAN_INSIDE, OUTSIDE
    return [
        (
            "part-2015-12-01-1005.csv",
            [
                yellow_row("2015-12-01 10:05:00", *ci),
                green_row("2015-12-01 10:05:30", *ci),
            ],
        ),
        (
            "part-2015-12-01-1030.csv",
            [
                yellow_row("2015-12-01 10:30:00", *go),
                green_row("2015-12-01 10:31:00", *out),
            ],
        ),
        (
            "part-2015-12-01-1115.csv",
            [
                yellow_row("2015-12-01 11:15:00", *ci),
                green_row("2015-12-01 11:16:00", *out),
                yellow_row("2015-12-01 11:17:00", *out),
            ],
        ),
    ]


EXPECTED_HOURLY = {10: 4, 11: 3}
EXPECTED_GEOFENCE_HOURLY = {(10, "citigroup"): 2, (10, "goldman"): 1, (11, "citigroup"): 1}
