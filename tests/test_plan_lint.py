"""Mechanical plan-policy lint over the FULL query registry (VERDICT r5
item 8): at 16k+ LoC the no-cartesian / no-unjustified-BNLJ /
no-row-at-a-time-PythonUDF policy can't stay inspection-enforced. Every
restricted physical node in any registry query's plan must carry an
explicit annotation (tools/explain_audit.py:PLAN_ANNOTATIONS) naming why
it is deliberate; stale annotations fail too, so the table can't rot.

Mostly planning-only (qe.sparkPlan — the flagged join/UDF nodes are
decided at planning time, so the full registry lints in minutes at
sf0.001 instead of executing every query). "Mostly": building a spec's
DataFrame may itself run bounded driver-side jobs as side effects —
centroid/codebook/LUT collects in the similarity family, and the
persisted-index specs (sim_ivf_index_* / sim_ivfpq_index_persisted)
build and write real tempdir indexes that only their atexit hooks clean
up. Row-scale execution of the linted plan itself still never happens.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import lint_registry_plans  # noqa: E402


def test_registry_plans_obey_policy(spark, sf_dir):
    violations = lint_registry_plans(spark, sf_dir)
    assert not violations, "\n".join(violations)


def test_global_sort_detector_on_known_shapes():
    """Unit contract for has_global_sort_exchange (r10, verdict item 4):
    Sort/Window-fed single-partition exchanges flag; the 1-row final
    aggregate (HashAggregate-fed) does not."""
    from tools.explain_audit import has_global_sort_exchange

    window_plan = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[decile], functions=[count(1)])
   +- Project [price, decile]
      +- Window [ntile(10) windowspecdefinition(price ASC)], [price ASC]
         +- Sort [price ASC NULLS FIRST], false, 0
            +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=25]
               +- FileScan parquet [price]"""
    hits = has_global_sort_exchange(window_plan)
    assert hits == ["Window <- Sort"], hits

    agg_plan = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[sum(x)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- HashAggregate(keys=[], functions=[partial_sum(x)])
         +- FileScan parquet [x]"""
    assert has_global_sort_exchange(agg_plan) == []

    # Window directly over the exchange (no Sort — e.g. sum() OVER ())
    bare_window = """AdaptiveSparkPlan isFinalPlan=false
+- Project [share]
   +- Window [sum(n) windowspecdefinition(...)]
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
         +- HashAggregate(keys=[src], functions=[count(1)])"""
    assert has_global_sort_exchange(bare_window) == ["Project <- Window"]
