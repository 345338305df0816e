"""Driver-gate rotation contract (VERDICT r07 #2).

The driver records CORRECTNESS rows for roughly the first 50 entries of
``queries()`` each round; before r8 the ordering had ossified so 136 of
186 registered queries hadn't re-earned a driver row since r1-r4. The
rotation orders the window as (this round's changed plans, from
DRIVER_PRIORITY) + (everything else, oldest last-driver-green round
first, from the committed CORRECTNESS_r*.json history). These tests pin
that policy against the actual repo artifacts.
"""

from __future__ import annotations

import glob
import json
import os

from hpat_jl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history_files():
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def test_ordered_names_complete_and_unique():
    registry.load_all_plans()
    names = registry._ordered_names()
    assert len(names) == len(set(names)) == len(registry.REGISTRY)


def test_priority_leads():
    registry.load_all_plans()
    names = registry._ordered_names()
    prio = [n for n in dict.fromkeys(registry.DRIVER_PRIORITY)
            if n in registry.REGISTRY]
    assert names[: len(prio)] == prio


def test_rotation_orders_oldest_driver_round_first():
    if not _history_files():  # fresh clone: rotation inert by design
        return
    registry.load_all_plans()
    names = registry._ordered_names()
    last = registry._driver_round_history()
    prio = {n for n in registry.DRIVER_PRIORITY if n in registry.REGISTRY}
    rest = [n for n in names if n not in prio]
    rounds = [last.get(n, 0) for n in rest]
    assert rounds == sorted(rounds), (
        "non-priority queries must be ordered by oldest driver round"
    )


def test_window_rotates_vs_last_two_rounds():
    """>=30 of the first 50 window entries must be absent from the two
    most recent driver windows — the rotation's whole point."""
    files = _history_files()
    if len(files) < 2:
        return
    recent = set()
    for f in files[-2:]:
        recent |= set(json.load(open(f)))
    registry.load_all_plans()
    window = registry._ordered_names()[:50]
    fresh = [n for n in window if n not in recent]
    assert len(fresh) >= 30, (
        f"only {len(fresh)} of the 50-entry driver window are new vs the "
        "last two rounds — rotation regressed"
    )


def test_r10_window_completes_cumulative_coverage():
    """VERDICT r09 #2: every registered query with NO driver row in any
    r6-r9 window must sit in this round's DRIVER_PRIORITY, so
    CORRECTNESS_r10 closes the cumulative r6-r10 evidence at 186/186.
    Skips silently on a clone without the artifacts."""
    files = [
        f
        for f in _history_files()
        if any(f.endswith(f"CORRECTNESS_r0{r}.json") for r in (6, 7, 8, 9))
    ]
    if len(files) < 4:
        return
    covered = set()
    for f in files:
        covered |= set(json.load(open(f)))
    registry.load_all_plans()
    never = {n for n in registry.REGISTRY if n not in covered}
    prio = set(registry.DRIVER_PRIORITY)
    missing = sorted(never - prio)
    assert missing == [], (
        f"{len(missing)} queries have no r6-r9 driver row and are not in "
        f"this round's DRIVER_PRIORITY window: {missing}"
    )
    # and the whole priority list fits the ~50-row driver window
    assert len([n for n in prio if n in registry.REGISTRY]) <= 50


def test_history_reader_tolerates_garbage(tmp_path):
    """Unreadable artifacts are skipped, not fatal (driver sandboxes
    may lack the repo-root files entirely)."""
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        '{"q": {"rows_match": true}}'
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text('["a", "list"]')
    assert registry._driver_round_history(root=str(tmp_path)) == {"q": 2}
    assert registry._driver_round_history(root=str(tmp_path / "nope")) == {}
