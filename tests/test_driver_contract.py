"""Driver-contract simulation — what the round driver actually does:
import ``__spark_entry__`` from a FOREIGN cwd, run ``entry(spark)`` to
completion, and require ``queries()`` / ``oracle_sql()`` key consistency.
A path-handling or import-order regression here fails the whole round's
smoke check before any query runs."""

from __future__ import annotations

import importlib.util
import os
import tempfile


def _load_entry_module():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_test__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_from_foreign_cwd(spark):
    old = os.getcwd()
    try:
        os.chdir(tempfile.gettempdir())
        mod = _load_entry_module()
        df = mod.entry(spark)
        rows = df.collect()
    finally:
        os.chdir(old)
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == [
        "r_name", "n_name", "revenue", "n_orders"
    ]


def test_queries_and_oracles_are_consistent():
    mod = _load_entry_module()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "queries() must be non-empty"
    # every oracle belongs to a registered query
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in o.values())
    # every query is callable
    assert all(callable(f) for f in q.values())
    # the driver records the first len(RECORD_WINDOW) entries in dict
    # order: those must ALL be oracle-backed or the window wastes slots
    from urban_traffic_data_lake_project_spark.queries import RECORD_WINDOW

    head = list(q)[: len(RECORD_WINDOW)]
    assert tuple(head) == RECORD_WINDOW
    assert all(n in o for n in head)
