"""Round-4 lever-adoption decision (pure, unit-testable).

Encodes docs/R3_SESSION_NOTES.md's procedure over probe J's JSON rows:
adopt the argmax-Mrays e2e config among candidates whose image is
bit-identical to production AND whose wave-level rows show zero
mismatch (bitwise identity on chip). Used unattended by
scripts/session_r4.py; tested by tests/test_utils.py TestAdoptionR4.
"""

OCC_PROD = dict(engine="packets", group_size=2)

# (e2e tag, gates, toggles); gates are data so the decision is pure:
#   ("image", flag_probe)                      -> that probe row's
#                                                 identical == True
#   ("wave", probe, engine, mismatch_keys...)  -> row exists, no error,
#                                                 all counters zero
CANDIDATES = [
    ("shadow_packets_g2", [], dict()),
    ("shadow_packets_b128_g2",
     [("image", "e2e_same_image_b128_g2"),
      ("wave", "shadow7", "xla_b128_g2", "mismatch")],
     dict(occ=dict(engine="packets", group_size=2, block_size=128))),
    ("shadow_packets_g2_nosort",
     [("image", "e2e_same_image_xla_nosort"),
      ("wave", "shadow7", "xla_b64_g2_nosort", "mismatch")],
     dict(occ=dict(engine="packets", group_size=2, sort=False))),
    ("shadow_fused_b128",
     [("image", "e2e_same_image"),
      ("wave", "shadow7", "fused_b128", "mismatch")],
     dict(occ=dict(engine="packets_fused"))),
    ("shadow_fused_skip",
     [("image", "e2e_same_image_skip"),
      ("wave", "shadow7", "fused_b128_skip", "mismatch")],
     dict(occ=dict(engine="packets_fused", early_skip=True))),
    ("shadow_fused_skip_nosort",
     [("image", "e2e_same_image_nosort"),
      ("wave", "shadow7", "fused_b128_skip_nosort", "mismatch")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sort=False))),
    ("shadow_g2_nosort_b0",
     [("image", "e2e_same_image_nosort_b0")],
     dict(nosort_b0=True)),
    ("closest_sub",
     [("image", "e2e_same_image_closest_sub"),
      ("wave", "closest_sub", "pallas_sub", "mismatch_t", "mismatch_tri")],
     dict(closest_sub=True)),
    ("shadow_fused_skip_sub",
     [("image", "e2e_same_image_shadow_sub"),
      ("wave", "shadow7", "fused_b128_skip_sub", "mismatch")],
     dict(occ=dict(engine="packets_fused", early_skip=True,
                   sub_skip=True))),
    ("combo_sub",
     [("image", "e2e_same_image_combo_sub"),
      ("wave", "shadow7", "fused_b128_skip_sub", "mismatch"),
      ("wave", "closest_sub", "pallas_sub", "mismatch_t", "mismatch_tri")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sub_skip=True),
          closest_sub=True)),
    ("closest_cascade",
     [("image", "e2e_same_image_closest_cascade"),
      ("wave", "closest_cascade", "s128_sub", "mismatch_t",
       "mismatch_tri")],
     dict(closest_eng=dict(engine="cascade_fused"))),
    ("combo_cascade",
     [("image", "e2e_same_image_combo_cascade"),
      ("wave", "closest_cascade", "s128_sub", "mismatch_t",
       "mismatch_tri"),
      ("wave", "shadow7", "fused_b128_skip_sub", "mismatch")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sub_skip=True),
          closest_eng=dict(engine="cascade_fused"))),
    ("shadow_g2_exact",
     [("image", "e2e_same_image_g2_exact"),
      ("wave", "shadow7", "xla_b64_g2_exact16", "mismatch")],
     dict(occ=dict(engine="packets", group_size=2, exact_cull=16))),
    ("shadow_fused_exact",
     [("image", "e2e_same_image_shadow_exact"),
      ("wave", "shadow7", "fused_b128_skip_sub_exact16", "mismatch")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sub_skip=True,
                   exact_cull=16))),
    ("combo_cascade_exact",
     [("image", "e2e_same_image_combo_cascade_exact"),
      ("wave", "shadow7", "fused_b128_skip_sub_exact16", "mismatch"),
      ("wave", "closest_cascade", "s128_sub", "mismatch_t",
       "mismatch_tri")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sub_skip=True,
                   exact_cull=16),
          closest_eng=dict(engine="cascade_fused"))),
    ("combo_exact_full",
     [("image", "e2e_same_image_combo_exact_full"),
      ("wave", "shadow7", "fused_b128_skip_sub_exact16", "mismatch"),
      ("wave", "closest_cascade", "s128_sub_exact16", "mismatch_t",
       "mismatch_tri")],
     dict(occ=dict(engine="packets_fused", early_skip=True, sub_skip=True,
                   exact_cull=16),
          closest_eng=dict(engine="cascade_fused", exact_cull=16))),
]


def _gate_ok(gate, by_probe):
    if gate[0] == "image":
        for r in by_probe.get(gate[1], []):
            return bool(r.get("identical"))
        return False
    _, probe, engine, *keys = gate
    for r in by_probe.get(probe, []):
        if r.get("engine") == engine:
            if "error" in r:
                return False
            return all(r.get(k, 0) == 0 for k in keys)
    return False


def decide(rows):
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
    for tag, gates, toggles in CANDIDATES:
        m = e2e_mrays(tag)
        eligible = m is not None and all(
            _gate_ok(g, by_probe) for g in gates)
        out.append(dict(config=tag, mrays=m, eligible=bool(eligible)))
        if eligible and (best is None or m > best[0]):
            best = (m, tag, toggles)
    return best, out
