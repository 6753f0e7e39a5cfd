"""Evidence-rotation policy (VERDICT r9 #1): the driver window must
drain never-driver-checked queries first, use FULLDRIVE greens only as
a tie-break, and never let self-reported evidence flatten the driver
staleness ledger."""

from __future__ import annotations

from gisaid_pipeline_functions_spark import registry


def _order(monkeypatch, driver, fulldrive, names):
    monkeypatch.setattr(registry, "_evidence", lambda: (driver, fulldrive))
    monkeypatch.setattr(registry, "_RECHECK_FIRST", frozenset())
    return list(registry._ordered({n: n for n in names}))


def test_never_driven_sort_first(monkeypatch):
    names = ["a", "b", "c", "d"]
    driver = {"a": 9, "b": 3}
    fulldrive = {n: 9 for n in names}  # a fulldrive green for EVERYONE
    out = _order(monkeypatch, driver, fulldrive, names)
    # c and d (no driver row ever) outrank even the six-rounds-stale b;
    # the round-global fulldrive does NOT flatten the order
    assert out == ["c", "d", "b", "a"]


def test_fulldrive_breaks_ties_within_equal_driver_rounds(monkeypatch):
    names = ["x", "y", "z"]
    driver = {"x": 5, "y": 5, "z": 5}
    fulldrive = {"x": 9, "y": 7}  # z: never fulldrive-green
    out = _order(monkeypatch, driver, fulldrive, names)
    assert out == ["z", "y", "x"]


def test_registration_order_is_last_resort(monkeypatch):
    names = ["q2", "q1", "q3"]
    out = _order(monkeypatch, {}, {}, names)
    assert out == names  # fresh checkout: registration order holds


def test_real_ledgers_window_is_the_stalest_cohort():
    """Rotation invariant (VERDICT r11 #1): against the LIVE ledger, the
    driver window (first 50 names) holds the stalest driver evidence — no
    name outside the window is strictly staler than an unforced name
    inside it — and never-driven names, when any exist, fill the window
    before any driver-green name. Unlike the old ``>= 40 never-driven``
    assertion (the r10 milestone, which broke the moment CORRECTNESS_r11
    drained that cohort to zero), this holds in every future ledger
    state."""
    driver, _ = registry._evidence()
    qs = list(registry.queries())
    window, rest = qs[:50], qs[50:]
    forced = {
        n
        for n in window
        if n in registry._RECHECK_FIRST
        and driver.get(n, -1) < registry._RECHECK_ROUND
    }
    if rest:
        stalest_outside = min(driver.get(n, 0) for n in rest)
        for n in window:
            if n not in forced:
                assert driver.get(n, 0) <= stalest_outside, n
    never_driven = [n for n in qs if n not in driver]
    in_window_never = [n for n in window if n not in driver]
    forced_green_slots = len([n for n in forced if n in driver])
    assert len(in_window_never) == min(
        len(never_driven), 50 - forced_green_slots
    )
