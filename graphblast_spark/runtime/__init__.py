from graphblast_spark.runtime.superstep import SuperstepRunner

__all__ = ["SuperstepRunner"]
