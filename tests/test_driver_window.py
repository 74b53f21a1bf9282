"""The driver sampling window is DERIVED from the repo's own
CORRECTNESS_r*.json history (never-sampled → stale §2 core → oldest
evidence), not hand-maintained — pin the policy against a synthetic
history so the test stays valid as real rounds accumulate."""

from __future__ import annotations

import tms_etl_spark.catalog as cat

cat.load_all()


def test_window_is_prefix_and_sized():
    assert len(cat._DRIVER_PRIORITY) == cat._WINDOW == 50
    assert list(cat.QUERIES)[:50] == cat._DRIVER_PRIORITY


def test_policy_tiers_with_synthetic_history(monkeypatch):
    names = list(cat.QUERIES)
    core = sorted(cat._CORE_FAMILY)
    # synthetic history: everything sampled in round 5 except —
    # two never-sampled, the core family stale at round 2, and three
    # non-core stragglers at rounds 1/2/3
    never = [n for n in names if n not in cat._CORE_FAMILY][:2]
    stragglers = [n for n in names if n not in cat._CORE_FAMILY][2:5]
    latest = {n: 5 for n in names}
    for n in never:
        del latest[n]
    for n in core:
        latest[n] = 2
    for n, r in zip(stragglers, (1, 2, 3)):
        latest[n] = r
    monkeypatch.setattr(cat, "_evidence_history", lambda: (latest, set(), 6))

    w = cat._derive_driver_window()
    # tier 1: never-sampled lead, in registration order
    assert w[:2] == never
    # tier 2: the stale core family jumps the age queue — all of it,
    # before any non-core round-2 entry
    assert set(w[2 : 2 + len(core)]) == set(core)
    # tier 3: oldest evidence next (the round-1 straggler before the
    # round-2 one before the round-3 one)
    rest = w[2 + len(core) :]
    assert rest.index(stragglers[0]) < rest.index(stragglers[1])
    assert rest.index(stragglers[1]) < rest.index(stragglers[2])


def test_core_family_fresh_evidence_waits_its_turn(monkeypatch):
    names = list(cat.QUERIES)
    latest = {n: 1 for n in names}
    for n in cat._CORE_FAMILY:
        latest[n] = 5  # sampled last round: NOT stale
    monkeypatch.setattr(cat, "_evidence_history", lambda: (latest, set(), 6))
    w = cat._derive_driver_window()
    # with fresh evidence the core family sorts by age like everyone
    # else — round-1 entries fill the window first
    assert not (set(w) & cat._CORE_FAMILY)


def test_fresh_checkout_falls_back_to_registration_order(monkeypatch):
    monkeypatch.setattr(cat, "_evidence_history", lambda: ({}, set(), 1))
    w = cat._derive_driver_window()
    assert len(w) == 50 and set(w) <= set(cat.QUERIES)


def test_rotation_bounds_evidence_age(monkeypatch):
    """The checked invariant behind the derived window (VERDICT r6
    item 7): simulate the rotation round after round and assert no
    query's driver evidence ever ages past one full rotation cycle
    (ceil(N/W), +1 slack for core-family queue jumps), and the §2
    core family never ages past _CORE_MAX_AGE. This turns the
    rotation policy from a convention into a bound the suite
    enforces."""
    import math

    names = list(cat.QUERIES)
    n, w = len(names), cat._WINDOW
    cycle = math.ceil(n / w)
    latest: dict[str, int] = {}
    for rnd in range(1, cycle * 3 + 3):
        snap = dict(latest)
        monkeypatch.setattr(
            cat, "_evidence_history", lambda s=snap, r=rnd: (s, set(), r)
        )
        window = cat._derive_driver_window()
        assert len(window) == w
        for q in window:
            latest[q] = rnd
        if rnd > cycle:  # steady state reached
            ages = {q: rnd - latest.get(q, 0) for q in names}
            assert max(ages.values()) <= cycle + 1, (
                rnd,
                max(ages, key=ages.get),
            )
            for q in cat._CORE_FAMILY:
                assert ages[q] <= cat._CORE_MAX_AGE, (q, ages[q])


def test_current_window_takes_the_stalest_first():
    """Against the REAL CORRECTNESS history: every never-sampled query
    is in the window (while they fit), and no excluded query is
    strictly staler than any included tier-3 (non-core, sampled)
    query — i.e. the materialized window really is the burn-down
    front, so the backlog shrinks by a full window every round."""
    latest, red, now = cat._evidence_history()
    if not latest:  # fresh checkout: nothing to pin
        return
    names = list(cat.QUERIES)
    window = cat._DRIVER_PRIORITY
    never = [q for q in names if q not in latest]
    if len(never) <= len(window):
        assert set(never) <= set(window)
    tier3_ages = [
        now - latest[q]
        for q in window
        if q in latest and q not in cat._CORE_FAMILY and q not in red
    ]
    excluded = [q for q in names if q not in set(window)]
    if tier3_ages and excluded:
        floor = min(tier3_ages)
        for q in excluded:
            assert now - latest.get(q, now) <= floor, (
                q,
                "stale query left out of the window",
            )


def test_red_rows_reenter_before_age_queue(monkeypatch):
    """A query whose LATEST driver row failed re-enters the window
    immediately — after never-sampled, before the stale-core jump and
    the age queue (r10 policy tier 2: a wrong answer must get a fresh
    row next round, not after a full rotation)."""
    names = list(cat.QUERIES)
    non_core = [n for n in names if n not in cat._CORE_FAMILY]
    never, red_q = non_core[0], non_core[1]
    latest = {n: 5 for n in names}
    del latest[never]
    for n in cat._CORE_FAMILY:
        latest[n] = 2  # stale core: would normally lead the seen tier
    monkeypatch.setattr(
        cat, "_evidence_history", lambda: (latest, {red_q}, 6)
    )
    w = cat._derive_driver_window()
    assert w[0] == never
    assert w[1] == red_q  # red beats stale core AND the age queue
    assert set(w[2 : 2 + len(cat._CORE_FAMILY)]) == set(cat._CORE_FAMILY)


def test_real_history_red_rows_lead_after_never_sampled():
    """Against the REAL history: every red-latest query is in the
    materialized window (it needs a green row next round)."""
    latest, red, now = cat._evidence_history()
    if red:
        assert red <= set(cat._DRIVER_PRIORITY), red
