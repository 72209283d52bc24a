"""Merge session D's adjudication rows into results_r5.json.

Run AFTER the session D client has exited (run_baselines and the
session's own bigscene merge both load-modify-write the artifact, so
editing it mid-session gets clobbered at the next section end). Parses
the session's stdout JSON lines into compact artifact entries:

  - big-scene shadow exact-cull adjudication (VERDICT r4 weak #3
    adopt-or-prune input),
  - the extended kernel ladder (packt / dual8 / g16 floor variants),
  - the GROUP=16 / pre-transposed-pack e2e panel with bitwise gates.

The bigscene e2e escalation and the 4K lineage are merged by the
session itself. Finishes by regenerating RESULTS.md from the artifact.

Usage: python scripts/merge_r5d.py [stdout-path]
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo/scripts")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/session_r5d.out"
P = os.environ.get("PT_RESULTS_PATH", "/root/repo/results/results_r5.json")

rows = []
with open(OUT) as f:
    for line in f:
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except ValueError:
                pass


def by(probe):
    return [r for r in rows if r.get("probe") == probe]


with open(P) as f:
    res = json.load(f)

merged = []

# --- big-scene 2^20 compile failure (the remaining blocker, attributed) ----
fail = [r for r in by("e2e_big") if r.get("status") == "error"]
if fail and "bigscene" in res:
    f0 = fail[0]
    res["bigscene"]["wave_2_%d_blocker" % f0["wave_log2"]] = dict(
        status="remote-compile failure (toolchain-side)",
        error=f0["error"].splitlines()[0][:200],
        note="production argument passing (1.9MB HLO) — constant "
             "inlining is excluded; 2^18 compiles and renders fine in "
             "the same session, so the limit is the tunnel compile "
             "helper at (10241 clusters x 2^20 rows); big-scene "
             "production runs at wave <= 2^18")
    merged.append("bigscene.wave_blocker")

# --- big-scene shadow exact-cull adjudication ------------------------------
sh = [r for r in by("bigshadow") if "ms" in r]
if sh:
    engines = {r["engine"]: {k: r[k] for k in
                             ("ms", "mrays", "compile_s", "occ_mismatch")
                             if k in r} for r in sh}
    prod_ms = engines.get("wl_prod", {}).get("ms", 0)
    exact_ok = all(e.get("occ_mismatch", 0) == 0 for e in engines.values())

    def rel(tag):
        ms = engines.get(tag, {}).get("ms")
        if not ms or not prod_ms:
            return f"{tag}: no row"
        d = (ms - prod_ms) / prod_ms
        word = "TIE" if abs(d) < 0.03 else (
            f"{abs(d):.0%} FASTER" if d < 0 else f"{abs(d):.0%} SLOWER")
        return f"{tag} {word} ({ms} vs {prod_ms}ms)"

    res["bigshadow_exact_adjudication_r5"] = dict(
        config="1.31M-tri scene, 2^16 synthetic shadow wave "
               "(surface-seeded, 4 lights, 30% dead lanes)",
        engines=engines,
        occlusion_exact=exact_ok,
        verdict=("vs wl_prod: "
                 + "; ".join(rel(t) for t in engines if t != "wl_prod")
                 + " — the standing big-scene justification for the "
                 "fused/exact machinery is adjudicated: no winner at "
                 "1.31M tris; everything stays opt-in "
                 "(WORKLIST_OCCLUDE_ENGINE, bit-identity CI-pinned)"))
    merged.append("bigshadow_exact_adjudication_r5")

# --- extended kernel ladder -------------------------------------------------
ladder = {r["variant"]: dict(ms=r["ms"], gtests_per_s=r["gtests_per_s"])
          for r in by("kernel_ladder") if "ms" in r}
gates = {r["variant"]: {k: r[k] for k in ("t_mismatch", "tri_mismatch")
                        if k in r}
         for r in by("kernel_ladder_gate")}
if ladder:
    entry = res.get("kernel_ladder_r5", dict(
        config="16384 production-shaped tiles, S=256, same-cid runs of 8",
        variants={}))
    entry["variants"].update(ladder)
    if gates:
        entry["gates"] = dict(entry.get("gates", {}), **gates)
    entry.setdefault(
        "note",
        "37% of kernel time is per-step pipeline/DMA/transpose floor — "
        "the documented single-chip headroom "
        "(docs/ARCHITECTURE.md ceiling plan)")
    res["kernel_ladder_r5"] = entry
    merged.append("kernel_ladder_r5")

# --- GROUP / pre-transposed-pack e2e panel ----------------------------------
panel = {r["config"]: dict(group=r.get("group"), mrays=r["mrays"])
         for r in by("e2e_group") if "mrays" in r}
ggates = by("e2e_group_gate")
if panel:
    wins = [g["config"] for g in ggates if g.get("wins")]
    res["group_e2e_r5"] = dict(
        spec="1920x1080@2spp/5b same-session A/B vs prod GROUP=8, "
             "bitwise image gates",
        mrays=panel,
        identical=all(g.get("identical") for g in ggates),
        winners=wins,
        verdict=("ADOPT: " + ", ".join(wins) if wins else
                 "REJECTED: wave-level g16 gain does not survive e2e "
                 "(pairs padding cost) — GROUP stays 8"))
    merged.append("group_e2e_r5")

with open(P, "w") as f:
    json.dump(res, f, indent=1)
print("merged:", merged)

if P == "/root/repo/results/results_r5.json":
    try:
        from run_baselines import write_results_md

        write_results_md(res, "/root/repo/RESULTS.md")
        print("RESULTS.md regenerated")
    except Exception as e:  # noqa: BLE001
        print(f"RESULTS.md regeneration failed: {e}")
else:
    print("test artifact path: skipping RESULTS.md regeneration")
