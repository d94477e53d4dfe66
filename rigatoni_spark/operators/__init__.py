from rigatoni_spark.operators.filters import (  # noqa: F401
    filter_data_modifications,
    filter_invalidates,
    filter_ops,
    match_pipeline,
    project_envelope,
)
from rigatoni_spark.operators.dedup import dedup_by_key, latest_by_key  # noqa: F401
from rigatoni_spark.operators.materialize import (  # noqa: F401
    materialize,
    materialize_stream,
)
from rigatoni_spark.operators.grouping import (  # noqa: F401
    count_by_operation,
    group_by_collection_counts,
)
from rigatoni_spark.operators.batching import (  # noqa: F401
    with_partition_cols,
    windowed_counts,
)
