#!/usr/bin/env python3
"""Deterministic fixture CSVs per FIXTURES.md (F1-F8).

Run once; outputs are committed so the driver's oracle SQL can read
them at stable absolute paths. Pure-stdlib, seeded, no RNG state
shared between files.
"""

from __future__ import annotations

import bz2
import gzip
import os
import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def f1_vibration(n=2000):
    """Headered sensor CSV, 8 kHz spacing (125 us) in user_ts."""
    rng = random.Random(42)
    lines = ["channel1,channel2,user_ts"]
    for i in range(n):  # n*125us < 1s, second stays fixed
        ts = f"2019-12-12 13:14:15.{i * 125:06d}+0000"
        lines.append(f"{rng.uniform(0, 0.02):.10f},{rng.uniform(0, 0.02):.10f},{ts}")
    return "\n".join(lines) + "\n"


def f2_typed(n=50):
    rng = random.Random(43)
    lines = ["id,value,status"]
    for i in range(n):
        lines.append(f"{i + 1},{rng.uniform(0, 100):.2f},{'OK' if i % 3 else 'WARN'}")
    return "\n".join(lines) + "\n"


def f3_ragged():
    # rows 0-2: the reference docs' worked example (docs/index.rst:52-67);
    # rows 3-5: quoted fields — comma inside quotes, doubled-quote escape,
    # quoted empty — per the reference's quote-aware pandas python-engine
    # read (csvplayback.py:587-597; built on csv.reader)
    return (
        "a,b,c\n"
        "2,3,,23\n"
        "4\n"
        'x,"b,c",d\n'
        '"he said ""hi""",z\n'
        '"q""q",,"last,one"\n'
    )


def f4_metadata(n=100):
    rng = random.Random(44)
    lines = [
        "device=XJ900 site=plant7",
        "calibrated=2020-01-01",
        "ts,temp,pressure",
    ]
    for i in range(n):  # n*1000us < 1s
        lines.append(
            f"2020-06-01 00:00:00.{i * 1000:06d}+0000,"
            f"{rng.uniform(20, 25):.2f},{rng.uniform(100, 102):.2f}"
        )
    return "\n".join(lines) + "\n"


def f5_timestamped(n=500):
    rng = random.Random(45)
    lines = ["ts,channel1,channel2"]
    for i in range(n):  # n*125us < 1s
        lines.append(
            f"2020-01-01 00:00:00.{i * 125:06d}+0000,"
            f"{rng.uniform(0, 1):.6f},{rng.uniform(0, 1):.6f}"
        )
    return "\n".join(lines) + "\n"


def f6_dirty():
    # empty cells, whitespace-only cells, an all-blank column, a
    # partially-null numeric column (interpolation target)
    rows = [
        "ts,a,b,allblank",
        "2020-01-01 00:00:00.000000+0000,1.0, ,",
        "2020-01-01 00:00:00.000125+0000,,2.0,",
        "2020-01-01 00:00:00.000250+0000,3.0,  ,",
        "2020-01-01 00:00:00.000375+0000,4.0,4.5,",
        "2020-01-01 00:00:00.000500+0000,,6.0,",
        "2020-01-01 00:00:00.000625+0000,7.0,,",
    ]
    return "\n".join(rows) + "\n"


def f7_fledge_dump(n=200):
    rng = random.Random(46)
    lines = ["reading,user_ts"]
    for i in range(n):
        c1, c2 = rng.uniform(0, 0.02), rng.uniform(0, 0.02)
        us = i * 125
        # CSV-quoted JSON with doubled quotes, as Fledge exports it
        lines.append(
            f'"{{""channel1"":{c1:.10f},""channel2"":{c2:.10f}}}",'
            f"2019-12-12 13:14:15.{us % 1_000_000:06d}+0000"
        )
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    f1 = f1_vibration()
    files = {
        "vibration.csv": f1,
        "typed.csv": f2_typed(),
        "ragged.csv": f3_ragged(),
        "metadata_header.csv": f4_metadata(),
        "timestamped.csv": f5_timestamped(),
        "dirty.csv": f6_dirty(),
        "fledge_dump.csv": f7_fledge_dump(),
        "empty.csv": "",
    }
    for name, content in files.items():
        with open(os.path.join(OUT, name), "w") as f:
            f.write(content)
    with gzip.open(os.path.join(OUT, "vibration.csv.gz"), "wt") as f:
        f.write(f1)
    with bz2.open(os.path.join(OUT, "vibration.csv.bz2"), "wt") as f:
        f.write(f1)
    # multi-file dir for alphabetical pick-first + lifecycle tests
    d = os.path.join(OUT, "multi")
    os.makedirs(d, exist_ok=True)
    for fn in ("a_vib.csv", "b_vib.csv"):
        with open(os.path.join(d, fn), "w") as f:
            f.write("channel1,channel2,user_ts\n" + f1.split("\n", 1)[1])
    print("wrote", sorted(os.listdir(OUT)))


if __name__ == "__main__":
    main()
