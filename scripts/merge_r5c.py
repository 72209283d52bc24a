"""Merge session C's adjudication rows into results_r5.json.

Run AFTER the session C client has exited (run_baselines rewrites the
artifact at the end of its 4K section; editing it mid-session would be
overwritten). Parses /tmp/session_r5c.out JSON lines into compact
artifact entries: the closest/shadow stage splits at the adopted config,
the pairs-retune + e2e panel (pair_split rejection), and the kernel
ladder attribution.
"""
import json
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/session_r5c.out"
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

# The delta at upto="sweep" is the fused sweep+resolve stage; the delta
# at upto="full" is the outro unsort (everything after the fallback).
_LBL = {"sweep": "sweep+resolve", "full": "unsort"}
stage = {_LBL.get(r["upto"], r["upto"]): r["delta_ms"]
         for r in by("closest_stage_r5") if "delta_ms" in r}
if stage:
    res["closest_stage_split_r5"] = dict(
        config="2^20 wave, adopted fbsorted_fc12 config, S=256 accel",
        total_ms=round(sum(stage.values()), 1), delta_ms=stage,
        note="sweep+resolve dominates (55%); fallback is ~free after "
             "fbsorted+fc4096; see docs/ARCHITECTURE.md ceiling plan")

sh = {r["upto"]: r["ms"] for r in by("shadow_stage_r5") if "ms" in r}
if sh:
    res["shadow_stage_split_r5"] = dict(
        config="2^20 shadow wave, b64 g2 dir-sort, S=128 accel",
        ms=sh, note="cascade is ~89% of the wave — no scheduling fat")

panel = {r["config"]: r["mrays"] for r in by("e2e_retune") if "mrays" in r}
gates = by("e2e_retune_gate")
if panel:
    res["pairs_retune_e2e_r5"] = dict(
        spec="1920x1080@2spp/5b same-session A/B, bitwise image gates",
        mrays=panel,
        identical=all(g.get("identical") for g in gates),
        verdict="REJECTED: every pairs-stage variant (split16/split32/"
                "cap44/cap40); the session-B split16 win was session "
                "noise (delta flipped sign) — pair_split stays opt-in")

ladder = {r["variant"]: dict(ms=r["ms"], gtests_per_s=r["gtests_per_s"])
          for r in by("kernel_ladder") if "ms" in r}
if ladder:
    res["kernel_ladder_r5"] = dict(
        config="16384 production-shaped tiles, S=256, same-cid runs of 8",
        variants=ladder,
        note="resolve tail 8%; pure MT ~62 Gtests/s; 37% of kernel time "
             "is per-step pipeline/DMA/transpose floor — the documented "
             "single-chip headroom (docs/ARCHITECTURE.md ceiling plan)")

hist = by("union_hist_ext")
if hist:
    res["union_hist_r5"] = {k: v for k, v in hist[0].items()
                            if k != "probe"}

with open(P, "w") as f:
    json.dump(res, f, indent=1)
print("merged:", [k for k in ("closest_stage_split_r5",
                              "shadow_stage_split_r5",
                              "pairs_retune_e2e_r5", "kernel_ladder_r5",
                              "union_hist_r5") if k in res])
