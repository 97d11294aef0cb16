"""CI regression for the soak harness (round-7 VERDICT #3 'done'
criterion): the short profile must still drive HTTP → spool → two
concurrent streaming sinks (clustered parquet + Derby JDBC), survive the
mid-soak kill/restart, and deliver every accepted row to both sinks.

Runs tools/soak.py as a subprocess — its own SparkSession/JVM, exactly
how the recorded soaks in docs/SOAK.md run."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_soak_short_profile_runs_green():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "soak.py"), "--short"],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=600,
    )
    lines = [
        ln
        for ln in proc.stdout.replace("\r", "\n").splitlines()
        if ln.startswith("{")
    ]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert lines, "soak printed no JSON summary"
    s = json.loads(lines[-1])
    # load really flowed, and the 400/401 gates were exercised under it
    assert s["accepted_202"] > 0
    assert s["rejected_400"] > 0
    assert s["rejected_401"] > 0
    assert s["client_errors"] == 0
    # at-least-once across the crash/restart: every accepted row reached
    # BOTH sinks; the injected sink-write-then-crash MUST have produced
    # an observable replay (duplicate rows) in the ledger-less parquet
    # sink — replays ADD rows, never lose them
    assert s["delivered_all"] is True
    assert s["parquet_distinct"] >= s["accepted_202"]
    assert s["derby_distinct"] >= s["accepted_202"]
    assert s["injected_crash_fired"] is True
    assert s["parquet_replay_dupes"] > 0
    assert s["stream_errors_unexpected"] == []
    # the crash/restart actually happened and metrics were captured
    assert s["restart_wall_sec"] is not None
    assert s["n_batches"] > 0
    assert s["batch_ms_p50"] is not None
