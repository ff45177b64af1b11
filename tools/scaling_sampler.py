#!/usr/bin/env python
"""Throttle-gated scaling sampler — hunts a CLEAN pixel-path scaling
pair on a host whose memory bandwidth is erratically throttled
(BENCH.md "Host limitation").

A sample is VALID only if ALL hold:
  1. memcpy control >= GATE GB/s immediately BEFORE the pair,
  2. memcpy control >= GATE GB/s immediately AFTER the pair,
  3. within-leg run variance bounded (max/min <= VAR_MAX for the
     3 timed runs of each leg) — a throttle event mid-leg shows up as
     a 2-10x spread.
Every attempt (valid or rejected, with the reason) is appended to the
JSONL log — the rejection log is itself evidence of the hunt.

Usage: python tools/scaling_sampler.py [hours] (default 1.0)
Log:   /tmp/moamosaic_scaling_sampler.jsonl
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

GATE = 6.0       # GB/s: below this the host is in its throttled state
VAR_MAX = 1.8    # max/min of a leg's 3 runs; throttle-mid-leg detector
POLL_S = 60
LOG = "/tmp/moamosaic_scaling_sampler.jsonl"


def log(rec: dict) -> None:
    rec["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def leg_variance(leg: dict) -> float:
    rs = leg["runs_seconds"]
    return max(rs) / min(rs)


def main() -> None:
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    deadline = time.time() + hours * 3600
    attempt = 0
    while time.time() < deadline:
        pre = bench.memcpy_control(4)
        if pre < GATE:
            log({"event": "poll", "pre_gbps": pre, "verdict": "throttled"})
            time.sleep(POLL_S)
            continue
        attempt += 1
        lo = bench.spawn("mosaic", 4)
        hi = bench.spawn("mosaic", 16)
        post = bench.memcpy_control(4)
        eff = (lo["seconds"] / hi["seconds"]) / 4.0
        rec = {
            "event": "pair",
            "attempt": attempt,
            "pre_gbps": pre,
            "post_gbps": post,
            "lo": lo,
            "hi": hi,
            "efficiency": round(eff, 3),
            "var_lo": round(leg_variance(lo), 2),
            "var_hi": round(leg_variance(hi), 2),
        }
        reasons = []
        if post < GATE:
            reasons.append(f"post control {post} < {GATE}")
        if leg_variance(lo) > VAR_MAX:
            reasons.append(f"lo-leg variance {leg_variance(lo):.2f}")
        if leg_variance(hi) > VAR_MAX:
            reasons.append(f"hi-leg variance {leg_variance(hi):.2f}")
        rec["verdict"] = "CLEAN" if not reasons else "rejected: " + "; ".join(reasons)
        log(rec)
        if not reasons:
            return  # first clean pair is the prize — stop and report
    log({"event": "done", "verdict": "no clean window in budget"})


if __name__ == "__main__":
    main()
