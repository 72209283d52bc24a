"""Shim: the round-3 outage retry loop (scripts/retry_loop.sh, still
resident from 2026-08-18) invokes this path on every attempt; round 4
redirects it to the round-4 bundled session so the first attempt after
the axon service recovers captures the WHOLE round (probes -> adoption ->
baselines -> 4K) in one client. See scripts/session_r4.py.
"""
import runpy
import sys

sys.argv = ["session_r4.py"] + list(sys.argv[1:])
runpy.run_path("/root/repo/scripts/session_r4.py", run_name="__main__")
