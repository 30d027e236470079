"""Docs stay in lock-step with the code they describe.

The query count in README.md drifted from the registry twice (rounds 5
and 6) — this test makes the registry the single source of truth: the
README line carries a `query-count` marker comment and must state
exactly ``len(queries())``.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_readme_query_count_matches_registry():
    import __spark_entry__ as entry

    n = len(entry.queries())
    readme = (REPO / "README.md").read_text()
    m = re.search(r"driver contract: (\d+) queries", readme)
    assert m, "README.md lost the 'driver contract: N queries' line"
    assert int(m.group(1)) == n, (
        f"README.md says {m.group(1)} queries, registry has {n} — "
        "update the README line (marked with the query-count comment)"
    )
    assert "query-count" in readme


def test_oracle_keys_subset_of_queries():
    """Every oracle_sql() key must have a queries() twin (a dangling
    oracle is dead weight the driver never checks)."""
    import __spark_entry__ as entry

    qs = set(entry.queries())
    extra = set(entry.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries(): {sorted(extra)}"
