from rdbms_subsetter_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    has_broadcast_hash_join,
    physical_plan,
    pushed_filters,
    wholestage_codegen_spans,
)
