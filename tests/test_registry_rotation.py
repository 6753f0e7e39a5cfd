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


def test_real_ledgers_put_never_driven_in_the_window():
    driver, fulldrive = registry._evidence()
    qs = registry.queries()
    window = list(qs)[:50]
    zero_prior = [n for n in window if n not in driver]
    # VERDICT r9 #1 done-criterion: the r10 window must be dominated by
    # zero-driver-evidence queries (92 exist as of r9 + the r10
    # registration)
    assert len(zero_prior) >= 40
