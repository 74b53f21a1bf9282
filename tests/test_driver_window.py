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
    monkeypatch.setattr(cat, "_evidence_history", lambda: (latest, 6))

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
    monkeypatch.setattr(cat, "_evidence_history", lambda: (latest, 6))
    w = cat._derive_driver_window()
    # with fresh evidence the core family sorts by age like everyone
    # else — round-1 entries fill the window first
    assert not (set(w) & cat._CORE_FAMILY)


def test_fresh_checkout_falls_back_to_registration_order(monkeypatch):
    monkeypatch.setattr(cat, "_evidence_history", lambda: ({}, 1))
    w = cat._derive_driver_window()
    assert len(w) == 50 and set(w) <= set(cat.QUERIES)
