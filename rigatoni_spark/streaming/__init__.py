from rigatoni_spark.streaming.pipeline import Pipeline, PipelineStats  # noqa: F401
