#!/usr/bin/env python3
"""Per-file subprocess test runner — the default `make test` gate.

This jaxlib's XLA CPU pipeline segfaults intermittently in processes that
perform MANY fresh compiles (observed inside backend_compile_and_load with
~70 tests in one process, while every per-file run passes). Running each
test file in its own subprocess is the only reliably-green mode on a
2-vCPU box, so it is the default gate; crashes (SIGSEGV/SIGABRT) are
retried once per file, real test failures are not.

Usage: python scripts/run_tests.py [-m MARKER] [-j N] [files...]
"""

import argparse
import glob
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CRASH_RCS = {-11, -6, 134, 139}  # SIGSEGV / SIGABRT, shell-encoded too


def run_file(path: str, marker: str | None) -> tuple[str, int, float, str]:
    cmd = [sys.executable, "-m", "pytest", path, "-q", "-x"]
    if marker:
        cmd += ["-m", marker]
    env = dict(os.environ, VIMZ_WARM_CHILD="1")
    t0 = time.time()
    for attempt in range(2):
        res = subprocess.run(
            cmd, cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        rc = res.returncode
        if rc not in CRASH_RCS:
            break
        print(f"  {os.path.basename(path)}: crashed (rc={rc}), retrying",
              flush=True)
    # pytest rc 5 = no tests collected (e.g. all deselected by marker)
    if rc == 5:
        rc = 0
    return path, rc, time.time() - t0, res.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", dest="marker", default=None)
    ap.add_argument("-j", dest="jobs", type=int,
                    default=min(2, os.cpu_count() or 1))
    ap.add_argument("files", nargs="*")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    print(f"running {len(files)} test files, {args.jobs} at a time", flush=True)
    t0 = time.time()
    failed = []
    with ThreadPoolExecutor(args.jobs) as ex:
        for path, rc, dt, out in ex.map(
            lambda f: run_file(f, args.marker), files
        ):
            tail = out.strip().splitlines()[-1] if out.strip() else ""
            status = "ok" if rc == 0 else f"FAIL rc={rc}"
            print(f"  {os.path.basename(path):34s} {status:12s} {dt:6.1f}s  {tail}",
                  flush=True)
            if rc != 0:
                failed.append((path, out))
    for path, out in failed:
        print(f"\n===== {path} =====\n{out}", flush=True)
    n = len(files)
    print(f"\n{n - len(failed)}/{n} files passed in {time.time() - t0:.0f}s",
          flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
