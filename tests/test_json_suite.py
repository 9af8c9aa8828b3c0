"""JSONTestSuite conformance corpus (public, nst/JSONTestSuite; shipped in the
reference at ``json/src/test/resources/test-parsing/``, 318 files) against the
engine's strict JSON loader — the corpus the reference's parser spec runs
layer-for-layer (SURVEY §5).

Contract: every ``y_`` document parses; every ``n_`` document is rejected
(undecodable-UTF-8 inputs count as rejected before the parser, exactly like a
charset-decoding stage); ``i_`` (implementation-defined) documents may do
either but must not crash the process."""

from pathlib import Path

import pytest

from fs2_data_spark.functions.jsonq import json_loads_strict

SUITE = Path("/root/reference/json/src/test/resources/test-parsing")
pytestmark = pytest.mark.skipif(not SUITE.exists(), reason="corpus absent")


def _files(prefix):
    return sorted(p.name for p in SUITE.glob(f"{prefix}_*.json")) if SUITE.exists() else []


@pytest.mark.parametrize("name", _files("y"))
def test_suite_accepts_valid(name):
    json_loads_strict((SUITE / name).read_text(encoding="utf-8"))


@pytest.mark.parametrize("name", _files("n"))
def test_suite_rejects_invalid(name):
    try:
        raw = (SUITE / name).read_bytes().decode("utf-8")
    except UnicodeDecodeError:
        return  # rejected by the charset layer
    with pytest.raises(Exception):
        json_loads_strict(raw)


@pytest.mark.parametrize("name", _files("i"))
def test_suite_impl_defined_never_crashes(name):
    try:
        raw = (SUITE / name).read_bytes().decode("utf-8")
    except UnicodeDecodeError:
        return
    try:
        json_loads_strict(raw)
    except Exception:
        pass  # either outcome is conformant for i_ files
