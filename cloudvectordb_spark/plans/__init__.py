"""Plan-shape linting: programmatic access to the scale-killer checks
that tools/plan_audit.py runs over the registry (SURVEY.md §4 posture).
"""

from cloudvectordb_spark.plans.lint import (  # noqa: F401
    audit_plan,
    formatted_plan,
    optimized_plan,
    physical_plan,
    single_partition_windows,
    unbounded_constant_key_windows,
)
