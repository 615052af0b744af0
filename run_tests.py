#!/usr/bin/env python
"""Full-suite test runner with per-file process isolation.

`python -m pytest tests/ -q` in ONE long-lived process intermittently
segfaults inside XLA-CPU `backend_compile_and_load` (jax/jaxlib 0.9.0; the
crash moves between tests run-to-run, so it is a compile-accumulation
instability, not a test bug). Running each test file in its own subprocess
sidesteps it deterministically and attributes any crash to a file.

Usage:
    python run_tests.py [-j N] [files...]

- runs each tests/test_*.py under its own `python -m pytest <file> -q`
- N subprocesses in flight at a time (default 4)
- a subprocess that dies on a signal (e.g. SIGSEGV) is retried once —
  a repeatable crash is reported as a crash, distinct from test failures
- exit code 0 iff every file passes

This is the documented test command (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Big files first so the parallel schedule packs well (measured round 4).
SLOW_FIRST = [
    "test_sparse_gcm.py",
    "test_nav_gcm.py",
    "test_torch_oracle.py",
    "test_banded_gcm.py",
    "test_parallel.py",
    "test_cartpole.py",
]


def order(files: list[str]) -> list[str]:
    rank = {name: i for i, name in enumerate(SLOW_FIRST)}
    return sorted(files, key=lambda f: rank.get(os.path.basename(f), len(rank)))


def run_file(path: str):
    # stdout goes to a temp FILE, not a pipe: a pipe is only drained after
    # exit, so a verbosely-failing file (>~64KB of tracebacks) would block
    # on write and deadlock the runner
    import tempfile

    out = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
    proc = subprocess.Popen(
        [sys.executable, "-m", "pytest", path, "-q", "--no-header"],
        stdout=out,
        stderr=subprocess.STDOUT,
        cwd=REPO,
        text=True,
    )
    return proc, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", type=int, default=4, help="concurrent subprocesses")
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    args = ap.parse_args()

    files = args.files or glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    files = order([os.path.relpath(f, REPO) for f in files])
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    t0 = time.time()
    pending = list(files)
    running: dict = {}  # file -> (proc, out_file, attempt)
    results: dict[str, tuple[int, str]] = {}  # file -> (rc, output)

    while pending or running:
        while pending and len(running) < args.j:
            f = pending.pop(0)
            running[f] = (*run_file(f), 1)
        done = None
        for f, (proc, _outf, attempt) in running.items():
            if proc.poll() is not None:
                done = f
                break
        if done is None:
            time.sleep(0.3)
            continue
        proc, outf, attempt = running.pop(done)
        outf.seek(0)
        out = outf.read()
        outf.close()
        rc = proc.returncode
        crashed = rc < 0 or rc == 139 or rc == 134
        if crashed and attempt == 1:
            print(f"  CRASH (rc={rc}) {done} — retrying once", flush=True)
            running[done] = (*run_file(done), 2)
            continue
        results[done] = (rc, out)
        tag = "ok" if rc == 0 else ("CRASH" if crashed else "FAIL")
        last = next(
            (ln for ln in reversed(out.splitlines()) if "passed" in ln or "failed" in ln or "error" in ln),
            "",
        )
        print(f"  [{len(results)}/{len(files)}] {tag:5s} {done}  {last.strip()}", flush=True)

    bad = {f: (rc, out) for f, (rc, out) in results.items() if rc != 0}
    for f, (rc, out) in bad.items():
        print(f"\n===== {f} (rc={rc}) =====")
        print("\n".join(out.splitlines()[-40:]))
    n_pass = len(results) - len(bad)
    print(
        f"\n{n_pass}/{len(files)} files green in {time.time() - t0:.0f}s"
        + (f"; FAILED: {sorted(bad)}" if bad else ""),
        flush=True,
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
