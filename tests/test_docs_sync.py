"""Docs must match the registry (VERDICT r4 'What's wrong' #4: README
counts drifted). The README states the query/oracle counts explicitly;
this test re-derives them from suite.load_all() so drift fails CI."""

from __future__ import annotations

import os
import re

from presto_on_ray_spark import suite

suite.load_all()

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    text = open(README, encoding="utf-8").read()
    m = re.search(r"(\d+) suite queries .*?(\d+) with DuckDB\s+oracles", text, re.S)
    assert m, "README no longer states the query/oracle counts"
    assert int(m.group(1)) == len(suite.QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(suite.QUERIES)}"
    )
    assert int(m.group(2)) == len(suite.ORACLES), (
        f"README says {m.group(2)} oracles, registry has {len(suite.ORACLES)}"
    )


def test_window_is_50_and_first():
    assert len(suite.CURATED_50) == 50
    assert list(suite.QUERIES)[:50] == suite.CURATED_50
