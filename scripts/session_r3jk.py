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


def tlog(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# Fine-grained init logging: localize WHERE a wedged tunnel hangs a
# client (plugin load vs first device op vs first D2H).
tlog("importing jax")
import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

tlog("creating backend (jax.devices)")
tlog(f"devices: {jax.devices()}")
tlog("first device op (jnp.zeros)")
jnp.zeros(()).block_until_ready()
tlog("first D2H pull")
_ = np.asarray(jnp.ones((8,), jnp.float32))
tlog("init complete")

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
