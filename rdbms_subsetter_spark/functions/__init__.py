from rdbms_subsetter_spark.functions.udfs import (  # noqa: F401
    grouped_zscore,
    sentence_split_udtf,
)
