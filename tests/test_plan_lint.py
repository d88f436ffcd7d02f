"""Mechanical plan-policy lint over the FULL query registry (VERDICT r5
item 8): at 16k+ LoC the no-cartesian / no-unjustified-BNLJ /
no-row-at-a-time-PythonUDF policy can't stay inspection-enforced. Every
restricted physical node in any registry query's plan must carry an
explicit annotation (tools/explain_audit.py:PLAN_ANNOTATIONS) naming why
it is deliberate; stale annotations fail too, so the table can't rot.

Planning-only (qe.sparkPlan, no execution): the flagged join/UDF nodes
are decided at planning time, so this covers all 156 queries in ~2 min
at sf0.001 instead of executing them all.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import lint_registry_plans  # noqa: E402


def test_registry_plans_obey_policy(spark, sf_dir):
    violations = lint_registry_plans(spark, sf_dir)
    assert not violations, "\n".join(violations)
