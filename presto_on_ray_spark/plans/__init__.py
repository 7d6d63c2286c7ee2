from presto_on_ray_spark.plans.inspect import (
    explain_formatted,
    physical_summary,
)

__all__ = ["explain_formatted", "physical_summary"]
