"""Driver-window invariants for the query registry.

The driver's CORRECTNESS artifact records at most 50 rows in
``queries()`` iteration order (r4 VERDICT #1: registrations beyond the
window silently lose their correctness evidence). These tests pin the
contract: every oracle-backed query fits in the window, and the
rows-only entries (model-driven by design) sit at the end.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _registry():
    from neuscraper_spark.queries import all_oracles, all_queries

    return all_queries(), all_oracles()


def test_registry_fits_driver_window():
    """Every oracle-backed query AND the flagship rows-only entry must
    sit inside the driver's 50-row window (r4 VERDICT sanctioned <=1
    rows-only row in-window when the window is full)."""
    queries, oracles = _registry()
    names = list(queries)
    oracle_backed = [n for n in names if n in oracles]
    assert len(oracle_backed) + 1 <= DRIVER_WINDOW, (
        f"{len(oracle_backed)} oracle-backed queries leave no room for the "
        f"flagship rows-only entry in the driver's {DRIVER_WINDOW}-row "
        "window; consolidate same-oracle entries (variant-tagged unions)"
    )
    in_window = set(names[:DRIVER_WINDOW])
    assert set(oracle_backed) <= in_window
    assert "pipeline_curate" in in_window, (
        "the flagship's rows-only row rotated out of the driver window"
    )


def test_oracle_backed_queries_come_first():
    queries, oracles = _registry()
    names = list(queries)
    seen_rows_only = False
    for name in names:
        if name not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed query {name!r} is registered after a "
                "rows-only entry — it could rotate out of the driver window"
            )
    # every oracle key actually has a registered query
    assert set(oracles) <= set(queries)


def test_rows_only_entries_are_the_sanctioned_two():
    queries, oracles = _registry()
    rows_only = [n for n in queries if n not in oracles]
    assert set(rows_only) <= {"s5_encoded_inference", "pipeline_curate"}, (
        "new rows-only entries need an oracle or an explicit sanction here: "
        f"{rows_only}"
    )
