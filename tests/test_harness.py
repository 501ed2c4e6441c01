"""Test-harness hang-guard demonstration (round-3 verdict Weak #7).

A single-process full-suite run once wedged with every thread asleep
and zero output; tests/conftest.py now arms a per-test faulthandler
watchdog.  This meta-test proves the watchdog works: a deliberately
hung test in a pytest subprocess must abort with dumped thread stacks
instead of freezing forever.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def test_watchdog_aborts_hung_test(tmp_path):
    tests_dir = Path(__file__).parent
    hang = tests_dir / "_tmp_watchdog_probe.py"
    hang.write_text(
        "import time\n\n\ndef test_deliberate_hang():\n"
        "    time.sleep(1e9)\n")
    log = tmp_path / "watchdog.log"
    env = dict(os.environ, GSLAM_TEST_TIMEOUT="5",
               GSLAM_WATCHDOG_LOG=str(log))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(hang), "-q",
             "-p", "no:cacheprovider"],
            cwd=tests_dir.parent, env=env, capture_output=True,
            text=True, timeout=180)
    finally:
        hang.unlink(missing_ok=True)
    # faulthandler.dump_traceback_later(exit=True) hard-exits the
    # process after dumping "Timeout (0:00:05)!" + all thread stacks
    # into the watchdog log (stderr would be eaten by pytest capture)
    assert proc.returncode != 0
    out = log.read_text() if log.exists() else ""
    assert "Timeout" in out and "test_deliberate_hang" in out, (
        out[-2000:], proc.stdout[-500:])
