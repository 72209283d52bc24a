"""One-client TPU session: bench + warm baseline refresh + 4K increment.

Run AFTER the shadow adoption decision is committed (bench and baselines
read the production defaults). Order matters: the bench's headline
number first (shortest), then the four static configs re-run warm at the
current engine speed, then the long 4K progressive increment — so an
interruption costs the tail, not the head. ~1.5-2h total.

Usage: python scripts/session_r3_final.py [--spp-increment N] [--skip-static]
"""
import json
import runpy
import sys
import time


def section(name, argv):
    sys.argv = argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(argv[0], run_name="__main__")
        status = "ok"
    except SystemExit as e:
        status = f"exit {e.code}" if e.code else "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    print(json.dumps(dict(probe="section", name=name, status=status,
                          wall_s=round(time.perf_counter() - t0, 1))),
          file=sys.stderr, flush=True)


inc = "64"
if "--spp-increment" in sys.argv:
    inc = sys.argv[sys.argv.index("--spp-increment") + 1]

section("bench", ["/root/repo/bench.py"])
if "--skip-static" not in sys.argv:
    # evidence/rmse1pct rows are engine-speed-independent accuracy
    # artifacts already recorded this round; don't re-pay their oracles.
    section("baselines_static",
            ["/root/repo/scripts/run_baselines.py", "--skip", "4k",
             "evidence", "rmse1pct"])
section("baselines_4k",
        ["/root/repo/scripts/run_baselines.py", "--skip", "cpu-ref",
         "cornell", "dielectric", "gpu-parity", "evidence", "rmse1pct",
         "--spp-increment", inc])
