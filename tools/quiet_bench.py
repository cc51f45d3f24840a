#!/usr/bin/env python
"""Run bench.py the next time the host is actually quiet.

r7/r8 found multi-hour windows where this VM's single-thread throughput
drops 2-6× with loadavg near zero and steal under-reported — wall-clock
benches recorded inside such a window are unusable (r7's 113.7 s carried
~30% inflation; an r8 attempt recorded 172 s with a 0.62 s calibration
loop vs the quiet 0.49 s).  This wrapper polls the same fixed
calibration loop bench.py embeds and fires the bench only when the host
passes, so recorded BENCH JSONs are comparable across rounds.

    python tools/quiet_bench.py [--out FILE] [--threshold 0.55]
                                [--max-wait-min 120]

Exit 0 with the bench JSON written to --out (and echoed) on success;
exit 2 if the window never arrived within --max-wait-min (no bench is
recorded — better no number than a wrong one).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def calibrate() -> float:
    from bench import _calibrate_cpu

    return _calibrate_cpu()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_quiet.json")
    ap.add_argument("--threshold", type=float, default=0.55,
                    help="max seconds for the calibration loop (quiet ~0.49)")
    ap.add_argument("--max-wait-min", type=float, default=120)
    ap.add_argument("--poll-sec", type=float, default=120)
    args = ap.parse_args()

    deadline = time.time() + args.max_wait_min * 60
    while True:
        c1 = calibrate()
        time.sleep(5)
        c2 = calibrate()
        print(f"calib: {c1:.3f}/{c2:.3f} (threshold {args.threshold})",
              flush=True)
        if max(c1, c2) <= args.threshold:
            break
        if time.time() > deadline:
            print("no quiet window within the wait budget; not benching")
            return 2
        time.sleep(args.poll_sec)

    with open(args.out, "w") as out:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py")],
            stdout=out,
            stderr=subprocess.DEVNULL,
        )
    with open(args.out) as f:
        print(f.read())
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
