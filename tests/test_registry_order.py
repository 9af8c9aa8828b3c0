"""Pin the driver-window ordering of the query registry.

The driver's correctness harness checks only the first 50 entries of
``__spark_entry__.queries()`` (VERDICT r02 item #1).  Every query that has
never received a driver CORRECTNESS row must sit inside that window; entries
rotated past it must all be twice driver-green staples.
"""

from fs2_data_spark.queries import REGISTRY, _DRIVER_FRONT, _DRIVER_TAIL

DRIVER_WINDOW = 50


def test_front_entries_inside_driver_window():
    names = list(REGISTRY)
    missing = [n for n in _DRIVER_FRONT if n in REGISTRY and names.index(n) >= DRIVER_WINDOW]
    assert missing == [], f"driver-unverified queries past the window: {missing}"


def test_flagship_is_first():
    assert next(iter(REGISTRY)) == "pit_fused_events"


def test_only_twice_green_staples_past_window():
    names = list(REGISTRY)
    overflow = set(names[DRIVER_WINDOW:])
    assert overflow <= set(_DRIVER_TAIL), (
        f"non-staple queries pushed past the driver window: "
        f"{overflow - set(_DRIVER_TAIL)}"
    )


def test_entry_module_preserves_order():
    import __spark_entry__ as e

    assert list(e.queries()) == list(REGISTRY)
    # oracle_sql preserves relative order of oracle-checkable entries
    sqls = list(e.oracle_sql())
    filtered = [n for n in REGISTRY if REGISTRY[n][1] is not None]
    assert sqls == filtered
