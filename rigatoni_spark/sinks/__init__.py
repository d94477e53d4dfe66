from rigatoni_spark.sinks.key_gen import generate_key  # noqa: F401
from rigatoni_spark.sinks.retry import RetryPolicy, with_retry  # noqa: F401
from rigatoni_spark.sinks.writers import write_batch  # noqa: F401
