from pdal_spark.plans.pipeline import Pipeline, PipelineError

__all__ = ["Pipeline", "PipelineError"]
