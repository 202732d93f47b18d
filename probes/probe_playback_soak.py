#!/usr/bin/env python3
"""Playback lifecycle soak (round-11 verdict item 7).

The playback layer's lifecycle transitions (rotate/delete, reconfigure
= restart, forced replay) are each pytest-covered in isolation; this
probe runs the COMPOSITION for minutes at a time — a forever stream
over a rotating landing directory with cleanSource=delete, one live
reconfigure (continuous -> burst) halfway, then a forced 2-loop replay
— asserting exact envelope counts per phase and that neither cached
frames nor file handles grow across the run.

Usage: python probes/probe_playback_soak.py [--seconds 600]
Prints one JSON line; non-zero exit on any failed invariant.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fledge_south_csvplayback_spark.config import IngestMode, PlaybackConfig
from fledge_south_csvplayback_spark.streaming import playback as pb

SCHEMA = "channel1 string, channel2 string, user_ts string"


def _write_file(d: str, i: int, rows: int) -> None:
    rng = random.Random(i)
    path = os.path.join(d, f"vib_{i:05d}.csv")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("channel1,channel2,user_ts\n")
        for k in range(rows):
            f.write(
                f"{rng.uniform(0, 0.02):.6f},{rng.uniform(0, 0.02):.6f},"
                f"2020-01-01 00:00:00.{k % 1_000_000:06d}+0000\n"
            )
    os.rename(tmp, path)  # land atomically so the stream never sees a half file


def _fd_count(pid: int | None) -> int:
    if pid is None:
        return -1
    try:
        return len(os.listdir(f"/proc/{pid}/fd"))
    except OSError:
        return -1


def _jvm_pid(spark) -> int | None:
    try:
        return spark.sparkContext._gateway.proc.pid
    except Exception:
        return None


def _cached_frames(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _wait_for(pred, timeout_s: float, what: str) -> None:
    t0 = time.monotonic()
    while not pred():
        if time.monotonic() - t0 > timeout_s:
            raise AssertionError(f"timeout waiting for {what}")
        time.sleep(0.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=600)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--rotate-every", type=float, default=5.0)
    args = ap.parse_args()

    from fledge_south_csvplayback_spark.session import get_spark

    spark = get_spark(app_name="playback-soak")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = _jvm_pid(spark)

    import tempfile

    work = tempfile.mkdtemp(prefix="soak_")
    land = os.path.join(work, "landing")
    os.makedirs(land)

    counts = {"phase1": 0, "phase2": 0}
    t_start = time.monotonic()
    phase_budget = max(20.0, (args.seconds - 30) / 2)

    # ---- phase 1: continuous stamping, rotating files, delete lifecycle
    cfg1 = PlaybackConfig(
        csv_dir_name=land,
        csv_file_name="vib",
        ingest_mode=IngestMode.CONTINUOUS,
        sample_rate=args.rows,
    )
    session = pb.PlaybackSession(
        spark, cfg1, SCHEMA, clean_source="delete"
    )

    def cb1(rows: list, batch_id: int) -> None:
        counts["phase1"] += len(rows)

    session.start_async(cb1)  # processingTime trigger: a forever stream
    written1 = 0
    _write_file(land, written1, args.rows)
    written1 += 1
    # warm baseline AFTER the stream is processing (codegen, pools open)
    _wait_for(lambda: counts["phase1"] >= args.rows, 120, "first file")
    base_fd = _fd_count(jvm_pid)
    base_py_fd = _fd_count(os.getpid())
    base_cached = _cached_frames(spark)

    while time.monotonic() - t_start < phase_budget:
        _write_file(land, written1, args.rows)
        written1 += 1
        time.sleep(args.rotate_every)
    _wait_for(
        lambda: counts["phase1"] >= written1 * args.rows,
        300,
        f"phase1 drain ({written1} files)",
    )
    assert counts["phase1"] == written1 * args.rows, (
        counts["phase1"],
        written1 * args.rows,
    )

    # ---- phase 2: live reconfigure (ST6) to burst mode, keep rotating
    def cb2(rows: list, batch_id: int) -> None:
        counts["phase2"] += len(rows)

    session.stop()
    time.sleep(3)  # stopped query's cleaner is done; dir now static
    leftover = len([f for f in os.listdir(land) if f.endswith(".csv")])
    cfg2 = PlaybackConfig(
        csv_dir_name=land,
        csv_file_name="vib",
        ingest_mode=IngestMode.BURST,
    )
    session.restart(cfg2, cb2)  # fresh checkpoint: leftovers re-read
    t_phase2 = time.monotonic()
    written2 = 0
    while time.monotonic() - t_phase2 < phase_budget:
        _write_file(land, 10_000 + written2, args.rows)
        written2 += 1
        time.sleep(args.rotate_every)
    expect2 = (leftover + written2) * args.rows
    _wait_for(
        lambda: counts["phase2"] >= expect2, 300, f"phase2 drain ({expect2})"
    )
    assert counts["phase2"] == expect2, (counts["phase2"], expect2)
    session.stop()

    # ---- phase 3: forced replay (ST7) over a static dir
    static = os.path.join(work, "static")
    os.makedirs(static)
    for i in range(2):
        _write_file(static, i, args.rows)
    cfg3 = PlaybackConfig(csv_dir_name=static, csv_file_name="vib")
    replay_total = pb.replay(spark, cfg3, SCHEMA, lambda r, b: None, 2)
    assert replay_total == 2 * 2 * args.rows, replay_total

    # ---- growth checks
    end_fd = _fd_count(jvm_pid)
    end_py_fd = _fd_count(os.getpid())
    end_cached = _cached_frames(spark)
    fd_delta = end_fd - base_fd if base_fd >= 0 else 0
    py_fd_delta = end_py_fd - base_py_fd if base_py_fd >= 0 else 0
    cached_delta = end_cached - base_cached

    out = {
        "probe": "playback_soak",
        "seconds": round(time.monotonic() - t_start, 1),
        "files_phase1": written1,
        "files_phase2": written2,
        "leftover_at_reconfigure": leftover,
        "rows_phase1": counts["phase1"],
        "rows_phase2": counts["phase2"],
        "rows_replay": replay_total,
        "jvm_fd_base": base_fd,
        "jvm_fd_end": end_fd,
        "py_fd_delta": py_fd_delta,
        "cached_frames_base": base_cached,
        "cached_frames_end": end_cached,
    }
    print(json.dumps(out))
    assert cached_delta == 0, f"cached frames grew: {cached_delta}"
    # allowance for pool/telemetry churn; a per-batch or per-file handle
    # leak over hundreds of batches would blow far past this
    assert fd_delta < 64, f"jvm fds grew: {base_fd} -> {end_fd}"
    assert py_fd_delta < 16, f"python fds grew: {py_fd_delta}"
    spark.stop()


if __name__ == "__main__":
    main()
