"""Shim: the round-3 outage retry loop (scripts/retry_loop.sh, still
resident from 2026-08-18) invokes this path on every attempt; round 4
redirects it to the round-4 bundled session so the first attempt after
the axon service recovers captures the WHOLE round (probes -> adoption ->
baselines -> 4K) in one client. See scripts/session_r4.py.
"""
import os
import runpy
import sys

if os.path.exists(
        os.environ.get("PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu")):
    # The driver bench asked for the tunnel: produce output so the retry
    # loop STOPS (it breaks on non-empty stdout) without starting a
    # client next to the bench's.
    print('{"probe": "stood_down_for_bench"}', flush=True)
    sys.exit(0)

sys.argv = ["session_r4.py"] + list(sys.argv[1:])
runpy.run_path("/root/repo/scripts/session_r4.py", run_name="__main__")
