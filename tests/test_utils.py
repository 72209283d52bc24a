"""utils: profiling, debug audits, device-buffer helpers, logging."""

import os

import numpy as np
import jax.numpy as jnp

from path_tracer_ai_tpu.utils.debug import validate_image
from path_tracer_ai_tpu.utils.device import download, nbytes_of, upload
from path_tracer_ai_tpu.utils.profiling import Timer, timed


def test_validate_image_flags_problems():
    img = np.zeros((4, 4, 3), np.float32)
    img[0, 0] = np.nan
    img[1, 1] = np.inf
    img[2, 2] = (1.0, 0.0, 1.0)  # magenta sentinel
    audit = validate_image(img)
    assert not audit.finite
    assert audit.n_nan == 3 and audit.n_inf == 3
    assert audit.n_magenta == 1


def test_validate_clean_image():
    audit = validate_image(np.full((4, 4, 3), 0.5, np.float32))
    assert audit.finite and audit.n_magenta == 0


def test_upload_download_roundtrip(rng):
    x = rng.standard_normal((16, 3)).astype(np.float32)
    np.testing.assert_array_equal(download(upload(x)), x)


def test_nbytes_of_pytree():
    tree = {"a": jnp.zeros((10, 3), jnp.float32), "b": jnp.zeros((5,), jnp.int32)}
    assert nbytes_of(tree) == 10 * 3 * 4 + 5 * 4


def test_timer_sections():
    t = Timer()
    with t.section("x"):
        sum(range(1000))
    with t.section("x"):
        pass
    assert t.counts["x"] == 2
    assert "x:" in t.report()


def test_timed_excludes_compile():
    import jax

    f = jax.jit(lambda x: x * 2)
    result, per_call = timed(f, jnp.ones(8), n=2)
    assert per_call >= 0
    np.testing.assert_array_equal(np.asarray(result), 2.0 * np.ones(8))


class TestBenchSupervisor:
    """bench.py's outage retry loop (round-4 driver lifeline): retries
    ONLY on the known axon-outage signature, forwards inner stdout on
    success, gives up on non-outage failures. Exercised via the
    PT_BENCH_INNER_CMD injection hook — no TPU clients involved."""

    def _run(self, inner_cmd, monkeypatch, deadline="60"):
        import importlib.util
        import subprocess
        import sys

        monkeypatch.setenv("PT_BENCH_INNER_CMD", inner_cmd)
        monkeypatch.setenv("PT_BENCH_RETRY_SLEEP", "0.1")
        monkeypatch.setenv("PT_BENCH_DEADLINE_S", deadline)
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, '/root/repo');"
             "import bench; sys.exit(bench._supervise([]))"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, timeout=60,
        )
        return out.returncode, out.stdout.decode()

    def test_success_passthrough(self, monkeypatch):
        rc, out = self._run("print('{\"value\": 1}')", monkeypatch)
        assert rc == 0
        assert '"value": 1' in out

    def test_non_outage_failure_no_retry(self, monkeypatch, tmp_path):
        # A genuine bug must fail ONCE, not loop for 45 min.
        marker = tmp_path / "n"
        rc, out = self._run(
            f"import pathlib; p = pathlib.Path({str(marker)!r});"
            "p.write_text(p.read_text() + 'x' if p.exists() else 'x');"
            "print('some real error'); raise SystemExit(3)",
            monkeypatch)
        assert rc == 3
        assert marker.read_text() == "x"  # exactly one attempt

    def test_outage_retries_then_succeeds(self, monkeypatch, tmp_path):
        marker = tmp_path / "n"
        inner = (
            "import pathlib;"
            f"p = pathlib.Path({str(marker)!r});"
            "n = len(p.read_text()) if p.exists() else 0;"
            "p.write_text('x' * (n + 1));"
            "print('{\"value\": 2}') if n >= 2 else ("
            "print('backend init failed: UNAVAILABLE: TPU backend "
            "setup/compile error'), exit(2))"
        )
        rc, out = self._run(inner, monkeypatch)
        assert rc == 0
        assert '"value": 2' in out
        assert marker.read_text() == "xxx"  # two outage attempts + success

    def test_outage_deadline_gives_up(self, monkeypatch):
        rc, out = self._run(
            "print('backend init failed: UNAVAILABLE: TPU backend "
            "setup/compile error'); raise SystemExit(2)",
            monkeypatch, deadline="-1")
        assert rc == 2


class TestBenchStanddown:
    """bench <-> outage-retry-loop coordination: one TPU client at a time.
    The bench supervisor writes a stop-file; the session shim
    (scripts/session_r3jk.py) exits-with-output when it exists, which
    stops scripts/retry_loop.sh without starting a TPU client."""

    def test_shim_stands_down_without_touching_tpu(self, tmp_path):
        import subprocess
        import sys

        stop = tmp_path / "stop"
        stop.write_text("123")
        env = dict(os.environ, PT_BENCH_STOPFILE=str(stop))
        out = subprocess.run(
            [sys.executable, "/root/repo/scripts/session_r3jk.py"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            env=env, timeout=30)
        assert out.returncode == 0
        assert b"stood_down_for_bench" in out.stdout  # non-empty stdout
        # stops the retry loop

    def test_session_client_detection(self):
        import importlib.util
        import subprocess
        import sys
        import time as _time

        spec = importlib.util.spec_from_file_location(
            "bench_mod", "/root/repo/bench.py")
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        # A dummy argv marker is enough: detection scans /proc cmdlines.
        # Use a unique marker so a LIVE outage-session client (the real
        # session_r3jk.py retry loop) can't perturb the test.
        marker = "pt_dummy_session_marker.py"
        proc = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(30)", marker])
        try:
            deadline = _time.monotonic() + 10
            while (not bench._session_client_running((marker.encode(),))
                   and _time.monotonic() < deadline):
                _time.sleep(0.1)
            assert bench._session_client_running((marker.encode(),))
        finally:
            proc.kill()  # our own dummy sleeper, by pid
            proc.wait()
        assert not bench._session_client_running((marker.encode(),))

    def test_supervisor_waits_out_session_client(self, monkeypatch,
                                                 tmp_path):
        import subprocess
        import sys

        # Dummy "session client" that exits on its own after ~2s; the
        # supervisor must wait for it, then run the inner cmd.
        marker = "pt_dummy_session_marker.py"
        dummy = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(2)", marker])
        try:
            env = dict(
                os.environ,
                PT_BENCH_INNER_CMD="print('{\"value\": 7}')",
                PT_BENCH_FORCE_STANDDOWN="1",
                PT_BENCH_SESSION_MARKERS=marker,
                PT_BENCH_STOPFILE=str(tmp_path / "stop"),
                PT_BENCH_RETRY_SLEEP="0.1",
                PT_BENCH_DEADLINE_S="60",
                PT_BENCH_SESSION_POLL_S="0.2",
                PT_BENCH_CLIENT_GAP_S="0.1",
            )
            out = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, '/root/repo');"
                 "import bench; sys.exit(bench._supervise([]))"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, timeout=60)
        finally:
            dummy.wait()
        assert out.returncode == 0
        assert b'"value": 7' in out.stdout
        assert b"waiting for it" in out.stderr
        assert (tmp_path / "stop").exists()


class TestAdoptionR4:
    """The unattended lever-adoption decision (scripts/adoption_r4.py)."""

    def _mod(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "adoption_r4", "/root/repo/scripts/adoption_r4.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _rows(self, **e2e):
        rows = [dict(probe="e2e", config=k, mrays=v)
                for k, v in e2e.items()]
        # all wave-level rows exact, all images identical by default
        for eng in ("xla_b64_g2_nosort", "fused_b128", "fused_b128_skip",
                    "fused_b128_skip_nosort", "fused_b128_skip_sub",
                    "fused_b128_skip_sub_exact16", "xla_b64_g2_exact16",
                    "xla_b128_g2"):
            rows.append(dict(probe="shadow7", engine=eng, mismatch=0))
        rows.append(dict(probe="closest_sub", engine="pallas_sub",
                         mismatch_t=0, mismatch_tri=0))
        rows.append(dict(probe="closest_cascade", engine="s128_sub",
                         mismatch_t=0, mismatch_tri=0))
        rows.append(dict(probe="closest_cascade", engine="s128_sub_exact16",
                         mismatch_t=0, mismatch_tri=0))
        for flag in ("e2e_same_image_xla_nosort", "e2e_same_image",
                     "e2e_same_image_skip", "e2e_same_image_nosort",
                     "e2e_same_image_nosort_b0",
                     "e2e_same_image_closest_sub",
                     "e2e_same_image_shadow_sub",
                     "e2e_same_image_combo_sub",
                     "e2e_same_image_closest_cascade",
                     "e2e_same_image_combo_cascade",
                     "e2e_same_image_shadow_exact",
                     "e2e_same_image_combo_cascade_exact",
                     "e2e_same_image_combo_exact_full",
                     "e2e_same_image_g2_exact",
                     "e2e_same_image_b128_g2"):
            rows.append(dict(probe=flag, identical=True))
        return rows

    def test_b128_shadow_candidate(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.28,
                          shadow_packets_b128_g2=3.4)
        best, _ = mod.decide(rows)
        assert best[1] == "shadow_packets_b128_g2"
        assert best[2]["occ"] == dict(engine="packets", group_size=2,
                                      block_size=128)
        for r in rows:
            if (r.get("probe") == "shadow7"
                    and r.get("engine") == "xla_b128_g2"):
                r["mismatch"] = 1
        best, _ = mod.decide(rows)
        assert best[1] == "shadow_packets_g2"

    def test_argmax_wins(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, combo_cascade=4.5,
                          combo_sub=4.1)
        best, cands = mod.decide(rows)
        assert best[1] == "combo_cascade" and best[0] == 4.5
        assert best[2]["closest_eng"] == dict(engine="cascade_fused")

    def test_exact_cull_candidate(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, combo_cascade=4.5,
                          combo_cascade_exact=5.1)
        best, _ = mod.decide(rows)
        assert best[1] == "combo_cascade_exact"
        assert best[2]["occ"]["exact_cull"] == 16
        # its wave gate is the exact16 row, not the plain sub row
        for r in rows:
            if (r.get("probe") == "shadow7"
                    and r.get("engine") == "fused_b128_skip_sub_exact16"):
                r["mismatch"] = 3
        best, cands = mod.decide(rows)
        assert best[1] == "combo_cascade"
        by = {c["config"]: c for c in cands}
        assert not by["combo_cascade_exact"]["eligible"]
        assert not by["shadow_fused_exact"]["eligible"]

    def test_exact_full_combo_gates_on_closest_exact_row(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, combo_exact_full=5.5)
        best, _ = mod.decide(rows)
        assert best[1] == "combo_exact_full"
        assert best[2]["closest_eng"] == dict(engine="cascade_fused",
                                              exact_cull=16)
        for r in rows:
            if (r.get("probe") == "closest_cascade"
                    and r.get("engine") == "s128_sub_exact16"):
                r["mismatch_tri"] = 2
        best, cands = mod.decide(rows)
        assert best[1] == "shadow_packets_g2"
        by = {c["config"]: c for c in cands}
        assert not by["combo_exact_full"]["eligible"]

    def test_image_mismatch_disqualifies(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, combo_cascade=4.5)
        for r in rows:
            if r.get("probe") == "e2e_same_image_combo_cascade":
                r["identical"] = False
        best, cands = mod.decide(rows)
        assert best[1] == "shadow_packets_g2"
        by = {c["config"]: c for c in cands}
        assert not by["combo_cascade"]["eligible"]

    def test_wave_mismatch_disqualifies(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, shadow_fused_skip=5.0)
        for r in rows:
            if (r.get("probe") == "shadow7"
                    and r.get("engine") == "fused_b128_skip"):
                r["mismatch"] = 7
        best, _ = mod.decide(rows)
        assert best[1] == "shadow_packets_g2"

    def test_errored_wave_row_disqualifies(self):
        mod = self._mod()
        rows = self._rows(shadow_packets_g2=3.0, closest_cascade=6.0)
        for r in rows:
            if (r.get("probe") == "closest_cascade"
                    and r.get("engine") == "s128_sub"):
                r.pop("mismatch_t"); r.pop("mismatch_tri")
                r["error"] = "boom"
        best, _ = mod.decide(rows)
        assert best[1] == "shadow_packets_g2"

    def test_no_rows_no_adoption(self):
        mod = self._mod()
        best, cands = mod.decide([])
        assert best is None
        assert all(not c["eligible"] for c in cands)


def test_adoption_artifact_roundtrip(tmp_path):
    """Promotion invariant (round-4 verdict task 8): an adoption artifact
    that encodes the committed wavefront defaults must apply as an exact
    no-op, and applying any artifact then promoting its values must leave
    the module in the state the session measured. Guards promotion drift
    between session-measured configs and shipped defaults."""
    import copy
    import importlib
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    from path_tracer_ai_tpu.engine import wavefront

    tracked = (
        "HYBRID_OCCLUDE_KW", "CTILES_CLOSEST_KW", "HYBRID_CLOSEST_KW",
        "SHADOW_NOSORT_BOUNCE0", "CLOSEST_NOSORT_BOUNCE0",
        "HYBRID_CLOSEST_CLUSTER_SIZE",
    )
    before = {k: copy.deepcopy(getattr(wavefront, k)) for k in tracked}
    try:
        # 1. An artifact encoding the committed defaults is a no-op.
        ident = tmp_path / "adopted_ident.json"
        ident.write_text(json.dumps({
            "config": "identity",
            "occ": before["HYBRID_OCCLUDE_KW"],
            "closest_kw": before["CTILES_CLOSEST_KW"],
            "closest_eng": before["HYBRID_CLOSEST_KW"],
            "nosort_b0": before["SHADOW_NOSORT_BOUNCE0"],
            "hybrid_closest_cluster_size":
                before["HYBRID_CLOSEST_CLUSTER_SIZE"],
        }))
        ad = bench.apply_adoption(wavefront, path=str(ident))
        assert ad is not None and ad["config"] == "identity"
        after = {k: getattr(wavefront, k) for k in tracked}
        assert after == before

        # 2. The latest session's exact adoption artifact matches the
        # promoted defaults (the artifact was deleted on promotion; this
        # pins the values it contained so the promotion can't silently
        # drift). Round 5: closest_fbsorted_fc12 (3.45 Mrays/s, on-chip
        # same-session A/B, images bit-identical) on top of round 4's
        # shadow_g2_nosort_b0 (3.46 vs 3.28).
        r5 = tmp_path / "adopted_r5.json"
        r5.write_text(json.dumps({
            "config": "closest_fbsorted_fc12", "mrays": 3.45,
            "occ": {"engine": "packets", "group_size": 2},
            "closest_kw": {"cap": 48, "tile_chunk": 2048,
                           "fallback_compact": 4096,
                           "fallback_sorted": True},
            "closest_eng": {"engine": "ctiles"},
            "nosort_b0": True,
            "hybrid_closest_cluster_size": 256,
        }))
        bench.apply_adoption(wavefront, path=str(r5))
        after_r5 = {k: getattr(wavefront, k) for k in tracked}
        assert after_r5 == before, (
            "committed wavefront defaults drifted from the round-5 "
            "session-adopted winner")

        # 3. Missing artifact -> None, no mutation.
        assert bench.apply_adoption(
            wavefront, path=str(tmp_path / "nope.json")) is None
        assert {k: getattr(wavefront, k) for k in tracked} == before
    finally:
        for k, v in before.items():
            setattr(wavefront, k, v)


class TestAdoptionR5:
    """The round-5 lever-adoption decision (scripts/adoption_r5.py)."""

    def _mod(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "adoption_r5", "/root/repo/scripts/adoption_r5.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _rows(self, **e2e):
        rows = [dict(probe="e2e", config=k, mrays=v)
                for k, v in e2e.items()]
        rows.append(dict(probe="closest_outro", engine="pallas_fbsorted",
                         mismatch_t=0, mismatch_tri=0))
        for flag in ("e2e_same_image_b128_g2", "e2e_same_image_fbsorted",
                     "e2e_same_image_combo",
                     "e2e_same_image_fbsorted_fc12"):
            rows.append(dict(probe=flag, identical=True))
        return rows

    def test_prod_baseline_always_eligible(self):
        mod = self._mod()
        best, cands = mod.decide([dict(probe="e2e", config="prod_r5",
                                       mrays=3.5)])
        assert best[1] == "prod_r5" and best[2] == {}
        by = {c["config"]: c for c in cands}
        assert by["prod_r5"]["eligible"]
        assert not by["combo_b128_fbsorted"]["eligible"]

    def test_argmax_combo_wins(self):
        mod = self._mod()
        rows = self._rows(prod_r5=3.46, occ_b128_g2=3.55,
                          closest_fbsorted=3.6, combo_b128_fbsorted=3.7)
        best, _ = mod.decide(rows)
        assert best[1] == "combo_b128_fbsorted"
        assert best[2]["occ"]["block_size"] == 128
        assert best[2]["closest_kw_update"] == dict(fallback_sorted=True)

    def test_image_mismatch_disqualifies(self):
        mod = self._mod()
        rows = self._rows(prod_r5=3.46, occ_b128_g2=3.9)
        for r in rows:
            if r.get("probe") == "e2e_same_image_b128_g2":
                r["identical"] = False
        best, cands = mod.decide(rows)
        assert best[1] == "prod_r5"
        by = {c["config"]: c for c in cands}
        assert not by["occ_b128_g2"]["eligible"]

    def test_fbsorted_gates_on_wave_bitwise_row(self):
        mod = self._mod()
        rows = self._rows(prod_r5=3.46, closest_fbsorted=3.8,
                          combo_b128_fbsorted=3.9)
        for r in rows:
            if (r.get("probe") == "closest_outro"
                    and r.get("engine") == "pallas_fbsorted"):
                r["mismatch_t"] = 5
        best, cands = mod.decide(rows)
        assert best[1] == "prod_r5"
        by = {c["config"]: c for c in cands}
        assert not by["closest_fbsorted"]["eligible"]
        assert not by["combo_b128_fbsorted"]["eligible"]

    def test_fc12_gates_on_its_own_image(self):
        mod = self._mod()
        rows = self._rows(prod_r5=3.46, closest_fbsorted_fc12=3.8)
        best, _ = mod.decide(rows)
        assert best[1] == "closest_fbsorted_fc12"
        assert best[2]["closest_kw_update"]["fallback_compact"] == 1 << 12

    def test_no_rows_no_adoption(self):
        mod = self._mod()
        best, cands = mod.decide([])
        assert best is None
        assert all(not c["eligible"] for c in cands)
