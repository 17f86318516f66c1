"""Driver-contract invariants that need no Spark session.

The external harness gates only the FIRST 50 ``queries()`` entries (dict
order) and compares each against ``oracle_sql()`` by sorted-column value
hash — these tests pin the contract shape so a refactor can't silently
push an operator outside the gated window or orphan an oracle.
"""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

entry_mod = importlib.import_module("__spark_entry__")

ROWS_ONLY = set()  # every gated entry has a full DuckDB value oracle


def test_exactly_fifty_entries():
    assert len(entry_mod.queries()) == 50


def test_all_entries_callable():
    assert all(callable(fn) for fn in entry_mod.queries().values())


def test_oracles_cover_all_but_documented_rows_only():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    assert qs - oracles == ROWS_ONLY, (
        "rows-only set drifted — every new entry needs an oracle or an "
        f"explicit justification here: {qs - oracles}"
    )


def test_oracle_sql_is_select_shaped():
    for name, sql in entry_mod.oracle_sql().items():
        s = sql.lstrip().upper()
        assert s.startswith(("SELECT", "WITH")), name
