"""Run probes J and K sequentially in ONE process (one TPU client).

The axon tunnel wedges on client churn (CLAUDE.md); bundling the round's
measurements into a single process avoids inter-client gaps and repeated
first-D2H setup. Each probe's results stream to stdout incrementally, so
a crash mid-K still preserves J.

Usage: python scripts/session_r3jk.py [--cpu]
"""
import json
import runpy
import sys
import time

args = [a for a in sys.argv[1:]]

for name in ("probe_r3j", "probe_r3k"):
    sys.argv = [f"{name}.py"] + args
    t0 = time.perf_counter()
    try:
        runpy.run_path(f"/root/repo/scripts/{name}.py", run_name="__main__")
        status = "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    print(json.dumps(dict(probe="section", name=name, status=status,
                          wall_s=round(time.perf_counter() - t0, 1))),
          flush=True)
