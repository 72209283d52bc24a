"""Round-2 final session: bench headline + the five BASELINE configs.

ONE TPU process (tunnel hazard rules): runs bench.py's main, then
run_baselines' main, in-process. bench output line goes to
/tmp/bench_r2.json as well as stdout.
"""

from __future__ import annotations

import io
import json
import sys
import contextlib

sys.path.insert(0, "/root/repo")


def main():
    # --- bench headline ------------------------------------------------------
    import bench

    sys.argv = ["bench.py"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print(line, flush=True)
    with open("/tmp/bench_r2.json", "w") as f:
        f.write(line + "\n")

    # --- baselines -----------------------------------------------------------
    from scripts import run_baselines

    sys.argv = ["run_baselines.py"]
    run_baselines.main()


if __name__ == "__main__":
    main()
