from presto_on_ray_spark.functions.numeric import davg, dsum
from presto_on_ray_spark.functions.registry import register_presto_functions

__all__ = ["dsum", "davg", "register_presto_functions"]
