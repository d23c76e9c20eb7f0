from hadoop_cs4225_spark.plans.explain import audit_plan, plan_string

__all__ = ["audit_plan", "plan_string"]
