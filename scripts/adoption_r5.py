"""Round-5 lever-adoption decision (pure, unit-testable).

Same procedure as round 4 (docs/R3_SESSION_NOTES.md, scripts/adoption_r4.py):
adopt the argmax-Mrays e2e config among candidates whose image is
bit-identical to production and whose wave-level rows (where one exists)
show zero mismatch. Round-5 candidates are the VERDICT r4 task-2/3 levers:

- occ_b128_g2: xla_b128_g2 shadow cascade (wave-level +3% in round 4,
  99.4 vs 102.4 ms, mismatch 0 — never e2e-adjudicated).
- closest_fbsorted: ctiles overflow fallback merged in the SORTED domain
  before the unsort (one fewer unsort column on the hot closest wave;
  bit-identity CI-pinned in tests/test_accel.py).
- combo_b128_fbsorted: both.
- closest_fbsorted_fc12: fallback_sorted + right-sized fallback_compact
  (4096 vs the 8192 default; overflow populations are tiny at cap=48).

The baseline tag is prod_r5 (the promoted round-4 winner: packets g2 +
bounce-0 nosort), which is always eligible — adoption never regresses.
Used unattended by scripts/session_r5.py; tested in tests/test_utils.py.
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

from adoption_r4 import _gate_ok  # noqa: E402  (shared gate semantics)

OCC_PROD = dict(engine="packets", group_size=2)

# (e2e tag, gates, toggles) — toggle keys consumed by session_r5:
#   occ               -> wavefront.HYBRID_OCCLUDE_KW
#   closest_kw_update -> CTILES_CLOSEST_KW = dict(prod, **update)
CANDIDATES = [
    ("prod_r5", [], dict()),
    ("occ_b128_g2",
     [("image", "e2e_same_image_b128_g2")],
     dict(occ=dict(engine="packets", group_size=2, block_size=128))),
    ("closest_fbsorted",
     [("image", "e2e_same_image_fbsorted"),
      ("wave", "closest_outro", "pallas_fbsorted",
       "mismatch_t", "mismatch_tri")],
     dict(closest_kw_update=dict(fallback_sorted=True))),
    ("combo_b128_fbsorted",
     [("image", "e2e_same_image_combo"),
      ("wave", "closest_outro", "pallas_fbsorted",
       "mismatch_t", "mismatch_tri")],
     dict(occ=dict(engine="packets", group_size=2, block_size=128),
          closest_kw_update=dict(fallback_sorted=True))),
    ("closest_fbsorted_fc12",
     [("image", "e2e_same_image_fbsorted_fc12")],
     dict(closest_kw_update=dict(fallback_sorted=True,
                                 fallback_compact=1 << 12))),
]


def decide(rows, candidates=CANDIDATES):
    """(best, candidates): best is (mrays, tag, toggles) or None;
    candidates is a list of dicts for emission (config/mrays/eligible)."""
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.get("probe"), []).append(r)

    def e2e_mrays(tag):
        for r in by_probe.get("e2e", []):
            if r.get("config") == tag and "mrays" in r:
                return float(r["mrays"])
        return None

    best = None
    out = []
    for tag, gates, toggles in candidates:
        m = e2e_mrays(tag)
        eligible = m is not None and all(
            _gate_ok(g, by_probe) for g in gates)
        out.append(dict(config=tag, mrays=m, eligible=bool(eligible)))
        if eligible and (best is None or m > best[0]):
            best = (m, tag, toggles)
    return best, out
