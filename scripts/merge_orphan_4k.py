"""One-shot: record the orphaned round-1..5 4K lineage in the artifact.

The round-5 tail session found the 4K checkpoint stamped mid-chunk
(spp320) by the killed main session, declared it stale, and restarted the
accumulation (bounded to its 96-spp increment by the round-4 advisor
fix). The 288-spp accumulator is unrecoverable (the checkpoint was
untracked at spp64 per the round-4 verdict, then overwritten), but the
lineage itself is history worth keeping: this script copies it from git
(commit 9e98926) into `4k.orphaned_lineage` with an incident note, and
points at the resume fix (checkpoint.compatible_spp) that prevents a
repeat. Run AFTER the tail session has finished writing results_r5.json.
"""
import json
import subprocess

P = "/root/repo/results/results_r5.json"

old = json.loads(subprocess.check_output(
    ["git", "-C", "/root/repo", "show", "9e98926:results/results_r5.json"]))
with open(P) as f:
    res = json.load(f)

r4k = res.get("4k", {})
r4k["orphaned_lineage"] = old["4k"]["lineage"]
r4k["orphaned_spp"] = old["4k"]["spp_cumulative"]
r4k["incident"] = (
    "2026-08-19: the main r5 session was killed mid-chunk (288->320), "
    "leaving the checkpoint stamped spp320; the tail session's resume "
    "only tried the chunk-boundary fingerprint (spp288), declared it "
    "stale, and restarted the accumulation — orphaning 288 spp across 9 "
    "sessions (rows preserved in orphaned_lineage). Fixed the same day: "
    "checkpoint.peek_fingerprint/compatible_spp now detect a mid-chunk "
    "stamp and run_baselines finishes the orphaned chunk in-render "
    "(tests/test_wavefront.py::test_mid_chunk_checkpoint_resumable)."
)
res["4k"] = r4k
with open(P, "w") as f:
    json.dump(res, f, indent=1)
print("merged: orphaned lineage", len(r4k["orphaned_lineage"]),
      "rows; active cum", r4k.get("spp_cumulative"))
