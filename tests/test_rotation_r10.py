"""Mechanical check of the r10 driver-visibility window (ADVICE r9:
the r9 rotation comment drifted from the list it described — 'trust,
but verify with a test'). Verifies the _ROTATION_R10 list itself
against queries() and the CORRECTNESS_r0*.json union, so the
composition claims in the comment cannot silently rot:

1. exactly 50 unique names, all resolving in the registry, and the
   registry's first 50 entries ARE the rotation list (the driver
   records only the first 50);
2. the declared-new entries have no prior driver record;
3. the staleness drain is complete oldest-first: every registered
   query whose latest driver hash is in a FULLY-DRAINED round class
   is inside the window;
4. drain entries are alphabetical within each age class.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

NEW_IN_R10 = {
    "weighted_consensus",
    "supplier_rank_tau",
    "preference_cycles",
    "copeland_ranking",
    "cycles_by_gap",
    "elo_calibration",
}
CHANGED_PATH_R10 = {
    "krippendorff_alpha",   # per-unit-m guard + shared votes derivation
    "kmv_set_ops",          # single-scan key materialization
    "dsir_select",          # importance.py delta/weights checkpoints
    "corpus_pipeline_v2",   # via importance.py
    "adamic_adar",          # graph.py edge-list checkpoint
    "matryoshka_audit",     # similarity.py single segment-dot pass
}
# age classes the r10 comment claims drain COMPLETELY this round
FULLY_DRAINED_ROUNDS = {2, 3}


def _latest_driver_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0*.json"))):
        rnd = int(Path(f).name.split("_r")[1].split(".")[0])
        for q in json.load(open(f)):
            latest[q] = rnd
    return latest


def test_rotation_r10_composition():
    import __spark_entry__ as m

    rot = m._ROTATION_R10
    assert len(rot) == 50 and len(set(rot)) == 50
    qs = m.queries()
    missing = [q for q in rot if q not in qs]
    assert not missing, f"rotation names not in queries(): {missing}"
    assert list(qs)[:50] == rot, "registry head is not the rotation list"

    latest = _latest_driver_round()
    never_checked = {q for q in rot if q not in latest}
    assert never_checked == NEW_IN_R10, (
        "declared-new set drifted from reality: "
        f"comment says {sorted(NEW_IN_R10)}, "
        f"no-prior-record set is {sorted(never_checked)}"
    )

    for rnd in FULLY_DRAINED_ROUNDS:
        cls = {q for q, v in latest.items() if v == rnd and q in qs}
        left_out = cls - set(rot)
        assert not left_out, (
            f"round-{rnd} class is claimed fully drained but "
            f"{sorted(left_out)} are outside the window"
        )

    # alphabetical within each drained age class
    drain = [q for q in rot if q not in NEW_IN_R10 | CHANGED_PATH_R10]
    by_class: dict[int, list[str]] = {}
    for q in drain:
        by_class.setdefault(latest[q], []).append(q)
    for rnd, names in by_class.items():
        assert names == sorted(names), (
            f"round-{rnd} drain entries not alphabetical: {names}"
        )
    # oldest-first across classes
    rounds_in_order = [latest[q] for q in drain]
    assert rounds_in_order == sorted(rounds_in_order), (
        "drain is not oldest-first"
    )
