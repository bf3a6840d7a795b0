"""Parity of our .mtx reader + fixture transliterations against the
reference's actual data files (read-only check — SURVEY §5.3: the
fixtures in sources/fixtures.py claim to BE these files)."""

from __future__ import annotations

import os

import pytest

from graphblast_spark.sources.fixtures import FIXTURES
from graphblast_spark.sources.mtx import read_mtx

REF = "/root/reference/data/small"

NAMES = ["test_pr", "test_cc", "test_bc", "test_mesh", "test_mis", "chesapeake"]


@pytest.mark.parametrize("name", NAMES)
def test_fixture_matches_reference_mtx(name):
    path = os.path.join(REF, f"{name}.mtx")
    if not os.path.exists(path):
        pytest.skip("reference data not present")
    n, symmetric, edges = read_mtx(path)
    fx = FIXTURES[name]
    assert fx["n"] == n
    assert fx["symmetric"] == symmetric
    assert sorted((s, d) for s, d, _ in fx["edges"]) == sorted(
        (s, d) for s, d, _ in edges
    )
