"""Physical-plan auditing (SURVEY.md §4: scale posture is verified, not
assumed).

``.explain`` output is the contract with the 100 TB deployment:
- filters must reach the parquet scan (``PushedFilters``);
- dim joins must be ``BroadcastHashJoin`` (fact table never shuffles
  for them);
- global top-k must be ``TakeOrderedAndProject`` (no total sort);
- hot paths must sit inside ``WholeStageCodegen`` spans.

tests/test_plans.py asserts these properties per flagship query so a
regression (e.g. a broadcast silently degrading to sort-merge-join)
fails CI rather than a cluster run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def audit_plan(
    df: DataFrame,
    require: tuple[str, ...] = (),
    forbid: tuple[str, ...] = (),
) -> list[str]:
    """Return a list of violations (empty = plan is as designed)."""
    plan = plan_string(df)
    problems = [f"missing: {frag}" for frag in require if frag not in plan]
    problems += [f"present: {frag}" for frag in forbid if frag in plan]
    return problems


def observed_metrics(df: DataFrame, name: str, *metrics):
    """Attach ``observe()`` metrics to a plan: named aggregate metrics
    (row counts, null counts, sums) collected DURING execution — the
    pipeline-health pattern that replaces a second validation scan.

    Returns (instrumented_df, observation): run any action on the
    instrumented frame, then read ``observation.get``. At 100 TB an
    extra ``count()`` for data-quality checks re-reads the table;
    observe rides along with the job for free (a ``CollectMetrics``
    node in the plan, merged into the existing aggregation tree).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
