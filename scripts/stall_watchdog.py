"""Watchdog for silent-client-death stalls on the tunneled TPU backend.

Failure mode (CLAUDE.md 2026-08-19): a training client loses its TCP
connection to the relay and hangs forever on a futex while the chip is
perfectly healthy. The run's metrics.jsonl stops advancing; `timeout`
only bounds the loss at hours.

This watchdog polls a metrics file. If its mtime goes stale for longer
than --stale-secs WHILE some process holds it open for writing, the
watchdog kills that exact PID (found via /proc/<pid>/fd — by open file
handle, never by command-line pattern, which could match this session).
Training auto-resumes from its Orbax checkpoint dir on relaunch, so the
orchestration shell around the dead run simply retries.

Usage:
  python scripts/stall_watchdog.py --file /path/metrics.jsonl \
      --stale-secs 900 [--once] [--grace-secs 600]
Exits 0 after killing (one shot) or when no writer holds the file.
"""
from __future__ import annotations

import argparse
import os
import signal
import time


def writers_of(path: str) -> list[int]:
    """PIDs holding `path` open (any mode; jsonl loggers keep it open)."""
    target = os.path.realpath(path)
    me = os.getpid()
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) == me:
            continue
        fddir = f"/proc/{d}/fd"
        try:
            for fd in os.listdir(fddir):
                try:
                    if os.path.realpath(os.path.join(fddir, fd)) == target:
                        pids.append(int(d))
                        break
                except OSError:
                    continue
        except OSError:
            continue
    return pids


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True)
    ap.add_argument("--stale-secs", type=int, default=900)
    ap.add_argument("--poll-secs", type=int, default=60)
    ap.add_argument("--grace-secs", type=int, default=600,
                    help="wait this long for the file to first appear/advance")
    ap.add_argument("--once", action="store_true",
                    help="exit after the first kill instead of re-arming")
    args = ap.parse_args()

    t_start = time.time()
    while True:
        time.sleep(args.poll_secs)
        try:
            age = time.time() - os.stat(args.file).st_mtime
        except OSError:
            if time.time() - t_start > args.grace_secs * 4:
                print(f"[watchdog] {args.file} never appeared; exiting", flush=True)
                return 0
            continue
        if age < args.stale_secs:
            continue
        pids = writers_of(args.file)
        if not pids:
            print(f"[watchdog] stale {age:.0f}s but no writer holds "
                  f"{args.file}; run is over — exiting", flush=True)
            return 0
        for pid in pids:
            print(f"[watchdog] {args.file} stale {age:.0f}s; killing writer "
                  f"pid {pid}", flush=True)
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError as e:
                print(f"[watchdog] kill {pid}: {e}", flush=True)
        if args.once:
            return 0
        time.sleep(args.stale_secs)  # let the orchestrator relaunch


if __name__ == "__main__":
    raise SystemExit(main())
