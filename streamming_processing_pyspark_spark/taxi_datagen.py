"""Deterministic synthetic taxi-data generator (FIXTURES.md §1 row formats).

Produces minute-files of mixed yellow(20)/green(22) ragged CSV rows for the
taxi-replay benchmark — same shape as the reference's taxi-data/ (1 file per
minute, drop-offs within the minute, ~10% of points inside the geofences so
the classify→window→trend pipeline has signal). LCG-based; no RNG imports.
"""

from __future__ import annotations

import os

_GEOFENCE_POINTS = [
    (-74.0110, 40.7209),  # citigroup interior
    (-74.0141, 40.7147),  # goldman interior (ray-cast semantics)
]
_OUTSIDE = (-73.97, 40.76)


def _lcg(state: int) -> int:
    return (1103515245 * state + 12345) % (2**31)


def generate_taxi_day(
    out_dir: str,
    rows_per_minute: int = 300,
    minutes: int = 120,
    date: str = "2015-12-01",
) -> int:
    """Write `minutes` one-per-minute CSV files; returns total rows."""
    os.makedirs(out_dir, exist_ok=True)
    state = 42
    total = 0
    for m in range(minutes):
        hh, mm = divmod(m, 60)
        lines = []
        for i in range(rows_per_minute):
            state = _lcg(state)
            sec = state % 60
            state = _lcg(state)
            inside = state % 10 == 0  # ~10% inside a geofence
            state = _lcg(state)
            lon, lat = (
                _GEOFENCE_POINTS[state % 2] if inside else (
                    _OUTSIDE[0] + (state % 1000) / 100000.0,
                    _OUTSIDE[1] + (state % 997) / 100000.0,
                )
            )
            ts = f"{date} {hh:02d}:{mm:02d}:{sec:02d}"
            state = _lcg(state)
            if state % 8 == 0:  # ~green share of NYC data
                lines.append(
                    f"green,2,{date} {hh:02d}:00:00,{ts},N,1,-73.98,40.69,"
                    f"{lon:.6f},{lat:.6f},1,2.18,9,0,0.5,1.96,0,,0.3,11.76,1,1"
                )
            else:
                lines.append(
                    f"yellow,1,{date} {hh:02d}:00:00,{ts},1,2.30,-73.96,40.79,"
                    f"1,N,{lon:.6f},{lat:.6f},2,14,0,0.5,0,0,0.3,14.8"
                )
        total += len(lines)
        with open(
            os.path.join(out_dir, f"part-{date}-{hh:02d}{mm:02d}.csv"), "w"
        ) as f:
            f.write("\n".join(lines) + "\n")
    return total
