from rdbms_subsetter_spark.functions.udfs import (  # noqa: F401
    grouped_zscore,
    horner_cubic,
    sentence_split_udtf,
)
