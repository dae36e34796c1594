#!/usr/bin/env python
"""Run the TPU-gated test suite and record the result as a committed
artifact (VERDICT round-2 weak #8: the checked-in suite is CPU-forced, so
the accelerator boundary leaves no trace; this JSON is that trace, the way
BENCH_r*.json records the bench run).

Run (device):  timeout 1800 python benchmarks/device_tests_run.py
Writes benchmarks/device_tests.json.
"""

import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "device_tests.json")


def main():
    env = dict(os.environ, QUFLOW_TPU_TESTS="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_device.py",
         "-v", "--tb=line", "-p", "no:cacheprovider"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1700,
    )
    tail = proc.stdout.strip().splitlines()[-15:]
    summary = next((ln for ln in reversed(tail) if "passed" in ln
                    or "failed" in ln or "error" in ln), "")
    result = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "command": "QUFLOW_TPU_TESTS=1 pytest tests/test_tpu_device.py",
        "returncode": proc.returncode,
        "ok": proc.returncode == 0,
        "summary": summary.strip("= "),
        "tail": tail,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(summary)
    print(f"written {OUT} (ok={result['ok']})")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
