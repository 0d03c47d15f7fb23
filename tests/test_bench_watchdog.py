"""bench.py stall-hardening: staged watchdogs + salvaging supervisor.

VERDICT r4 ask #3: round-4's official bench artifact was 0.0 because a
single whole-run watchdog turned one relay-link stall into a dead
round.  These tests force stalls and failures and assert that (a) a
stage is diagnosed by name, (b) an already-measured partial number is
salvaged, (c) a transient first-attempt failure is retried away.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from mvxnet_makise_tpu.utils.watchdog import (
    PartialWriter,
    StageStall,
    StageWatchdog,
    supervise,
)


def _child(body: str) -> list:
    return [sys.executable, "-c", textwrap.dedent(body)]


def test_supervisor_salvages_partial_on_stall():
    # child measures a "raw" number, flushes it, then wedges forever —
    # the supervisor must return that number, flagged partial
    rec = supervise(_child("""
        import json, os, time
        with open(os.environ["BENCH_PARTIALS"], "a") as f:
            f.write(json.dumps({"metric": "raw", "value": 68.7,
                                "unit": "frames/s"}) + "\\n")
        time.sleep(60)
    """), metric="e2e", attempt_timeout=15, retries=1)
    assert rec["value"] == 68.7
    assert rec["partial"] is True
    assert "timeout" in rec["error"]


def test_supervisor_retry_recovers_transient_failure(tmp_path):
    # first attempt exits rc=2 (watchdog fired); the retry succeeds —
    # the final record must be the retry's, marked retried
    flag = tmp_path / "attempted_once"
    rec = supervise(_child(f"""
        import json, os, sys
        flag = {str(flag)!r}
        if not os.path.exists(flag):
            open(flag, "w").close()
            print(json.dumps({{"metric": "e2e", "value": 0.0,
                               "error": "watchdog: stage 'serve'"}}))
            sys.exit(2)
        print(json.dumps({{"metric": "e2e", "value": 66.9,
                           "unit": "frames/s"}}))
    """), metric="e2e", attempt_timeout=30, retries=1)
    assert rec["value"] == 66.9
    assert rec["retried"] == 1
    assert "error" not in rec


def test_supervisor_error_record_when_nothing_salvageable():
    rec = supervise(_child("import sys; sys.exit(3)"),
                    metric="e2e", attempt_timeout=10, retries=1)
    assert rec["value"] == 0.0
    assert "rc=3" in rec["error"]


def test_stage_watchdog_names_the_wedged_stage(capsys):
    wd = StageWatchdog({"compile_raw": 30, "serve_compile": 1},
                       metric="e2e")
    try:
        wd.enter("serve_compile")
        with pytest.raises(StageStall):
            time.sleep(5)
    finally:
        wd.cancel()
        signal.signal(signal.SIGALRM, signal.SIG_DFL)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "serve_compile"
    assert "serve_compile" in rec["error"]
    assert rec["value"] == 0.0


def test_force_stall_injection_hook():
    # BENCH_FORCE_STALL wedges the named stage until its budget fires —
    # run in a subprocess so the wedge loop can't hang pytest
    proc = subprocess.run(_child("""
        from mvxnet_makise_tpu.utils.watchdog import StageWatchdog
        wd = StageWatchdog({"measure_raw": 1}, metric="e2e")
        wd.enter("measure_raw")
        print("unreachable")
    """), env=dict(os.environ, BENCH_FORCE_STALL="measure_raw"),
        capture_output=True, text=True, timeout=30)
    assert proc.returncode == 2
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["stage"] == "measure_raw"
    assert "unreachable" not in proc.stdout


def test_partial_writer_noop_without_path(tmp_path):
    PartialWriter(None).emit({"x": 1})  # must not raise
    p = tmp_path / "p.jsonl"
    w = PartialWriter(str(p))
    w.emit({"value": 1.0})
    w.emit({"value": 2.0})
    lines = [json.loads(s) for s in p.read_text().splitlines()]
    assert [r["value"] for r in lines] == [1.0, 2.0]
