"""Pin the driver-window rotation of the query registry.

The driver's correctness harness checks only the first 50 entries of
``__spark_entry__.queries()`` (VERDICT r02 item #1).  Round 3's verdict
(item #3) asked for a rotation policy instead of a fixed front/tail split:
every round the registry is reordered from the recorded driver-check history
so that (a) never-checked queries and queries changed after their last row
sit inside the window, and (b) no query's most recent driver row ages past
two rounds.
"""

from fs2_data_spark.queries import (
    CURRENT_ROUND,
    DRIVER_HISTORY,
    DRIVER_WINDOW,
    FORCE_FRONT,
    REGISTRY,
    driver_last_row,
)


def test_flagship_is_first():
    assert next(iter(REGISTRY)) == "pit_fused_events"


def test_never_checked_inside_window():
    names = list(REGISTRY)
    last = driver_last_row()
    missing = [n for n in names[DRIVER_WINDOW:] if last[n] == 0]
    assert missing == [], f"never-driver-checked queries past the window: {missing}"


def test_changed_queries_inside_window():
    names = list(REGISTRY)
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in FORCE_FRONT if n in REGISTRY and n not in window]
    assert missing == [], f"changed-after-last-row queries past the window: {missing}"


def test_no_row_older_than_two_rounds_after_this_check():
    """Staleness bound: once this round's driver check runs (covering the
    first 50 entries), every query's most recent row is from round
    CURRENT_ROUND-2 or later."""
    names = list(REGISTRY)
    last = driver_last_row()
    stale = [n for n in names[DRIVER_WINDOW:] if last[n] < CURRENT_ROUND - 2]
    assert stale == [], f"queries whose last driver row would be >2 rounds old: {stale}"


def test_window_capacity_not_exceeded():
    """The set that MUST be in the window (never-checked + forced + stale)
    fits in 50 — if this fails, the window needs a second rotation round."""
    last = driver_last_row()
    must = {n for n in REGISTRY
            if last[n] == 0 or n in FORCE_FRONT or last[n] < CURRENT_ROUND - 1}
    assert len(must) <= DRIVER_WINDOW


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
