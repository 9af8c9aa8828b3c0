"""Pin the driver-window rotation of the query registry.

The driver's correctness harness checks only the first 50 entries of
``__spark_entry__.queries()`` (VERDICT r02 item #1).  Round 3's verdict
(item #3) asked for a rotation policy instead of a fixed front/tail split:
every round the registry is reordered from the recorded driver-check history
so that (a) never-checked queries and queries changed after their last row
sit inside the window, and (b) no query's most recent driver row ages past
the revisit cycle.

The cycle length is ``ceil(len(REGISTRY) / DRIVER_WINDOW)``: a 50-slot
window over N queries can revisit every query at best every ``ceil(N/50)``
rounds, so a 2-round staleness bound was only achievable while N <= 100.
With N > 100 the bound derives from the registry size (currently 3
rounds) — asserting 2 would demand checking more than 50 queries per
round, which the driver cannot do.
"""

import math

from fs2_data_spark.queries import (
    CURRENT_ROUND,
    DRIVER_HISTORY,
    DRIVER_WINDOW,
    FORCE_FRONT,
    REGISTRY,
    driver_last_row,
)

# tightest achievable revisit cycle for this registry size (rounds)
CYCLE = max(2, math.ceil(len(REGISTRY) / DRIVER_WINDOW))


def test_flagship_is_first():
    assert next(iter(REGISTRY)) == "pit_fused_events"


def test_never_checked_inside_window():
    """All never-checked queries sit inside the window, except when the
    must-set (flagship + forced + never-checked) outgrows the 50 slots —
    then exactly the overflow count spills, and only from the never-checked
    tier (forced re-checks of known failures never spill)."""
    names = list(REGISTRY)
    last = driver_last_row()
    musts = ({n for n in REGISTRY if last[n] == 0}
             | {n for n in FORCE_FRONT if n in REGISTRY} | {"pit_fused_events"})
    allowed_spill = max(0, len(musts) - DRIVER_WINDOW)
    missing = [n for n in names[DRIVER_WINDOW:] if last[n] == 0]
    assert len(missing) <= allowed_spill, \
        f"never-driver-checked queries past the window: {missing}"


def test_changed_queries_inside_window():
    names = list(REGISTRY)
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in FORCE_FRONT if n in REGISTRY and n not in window]
    assert missing == [], f"changed-after-last-row queries past the window: {missing}"


def test_no_row_older_than_cycle_after_this_check():
    """Staleness bound: once this round's driver check runs (covering the
    first 50 entries), every query's most recent row is at most CYCLE
    rounds old."""
    names = list(REGISTRY)
    last = driver_last_row()
    # last == 0 (never checked) is governed by
    # test_never_checked_inside_window's spill allowance, not this bound
    stale = [n for n in names[DRIVER_WINDOW:]
             if 0 < last[n] < CURRENT_ROUND - CYCLE]
    assert stale == [], \
        f"queries whose last driver row would be >{CYCLE} rounds old: {stale}"


def test_window_capacity_not_exceeded():
    """The HARD must-set (flagship + forced re-checks + queries that would
    otherwise age past the cycle) fits in 50 — never-checked queries are
    soft musts (they may spill one round and stay tier-2; see
    test_never_checked_inside_window). If this fails, the registry has
    outgrown the achievable cycle and the bound above needs to lengthen
    (it derives from len(REGISTRY), so adding queries updates both sides
    together)."""
    last = driver_last_row()
    must = {n for n in REGISTRY
            if n in FORCE_FRONT
            or (0 < last[n] < CURRENT_ROUND - (CYCLE - 1))} | {"pit_fused_events"}
    assert len(must) <= DRIVER_WINDOW


def test_stalest_fill_the_window():
    """Among queries with history, the window's non-forced slots go to the
    stalest first — no fresher query sits inside while a staler one sits
    outside (the property that makes the cycle bound hold round over
    round)."""
    names = list(REGISTRY)
    last = driver_last_row()
    inside = [last[n] for n in names[:DRIVER_WINDOW]
              if last[n] > 0 and n not in FORCE_FRONT
              and n != "pit_fused_events"]  # flagship is pinned first
    outside = [last[n] for n in names[DRIVER_WINDOW:]
               if last[n] > 0 and n not in FORCE_FRONT]
    if inside and outside:
        assert max(inside) <= min(outside), \
            "a fresher query occupies a window slot while a staler one waits"


def test_history_names_are_registry_names():
    for rnd, checked in DRIVER_HISTORY.items():
        unknown = [n for n in checked if n not in REGISTRY]
        assert unknown == [], f"round {rnd} history references unknown queries: {unknown}"


def test_entry_module_preserves_order():
    import __spark_entry__ as e

    assert list(e.queries()) == list(REGISTRY)
    # oracle_sql preserves relative order of oracle-checkable entries
    sqls = list(e.oracle_sql())
    filtered = [n for n in REGISTRY if REGISTRY[n][1] is not None]
    assert sqls == filtered
