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


def test_stalest_queries_lead_the_window():
    """Rolling form of the r10 cumulative-coverage test (VERDICT r10
    #1): every registered query with NO driver row in the last four
    committed windows must appear in the first ~50 entries of this
    round's order — via DRIVER_PRIORITY or the oldest-round fallback —
    so no query's driver evidence can age past ~4 rounds. Skips on a
    clone without the artifacts."""
    files = _history_files()
    if len(files) < 4:
        return
    covered = set()
    for f in files[-4:]:
        covered |= set(json.load(open(f)))
    registry.load_all_plans()
    stale = {n for n in registry.REGISTRY if n not in covered}
    window = set(registry._ordered_names()[:50])
    overdue = sorted(stale - window)
    # The stale set can legitimately exceed one 50-row window right
    # after a hardening round; what must hold is that the window is
    # FULL of stale entries whenever any exist.
    if stale and overdue:
        assert len(window & stale) >= min(len(stale), 45), (
            f"{len(overdue)} queries with no driver row in the last 4 "
            f"rounds are outside the 50-entry window: {overdue[:10]}..."
        )
    # and the priority list itself fits the ~50-row driver window
    prio = [n for n in registry.DRIVER_PRIORITY if n in registry.REGISTRY]
    assert len(prio) <= 50


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
