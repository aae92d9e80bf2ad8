from rdbms_subsetter_spark.sources.io import (  # noqa: F401
    csv_roundtrip,
    json_roundtrip,
    read_csv,
    read_jdbc,
    read_json,
    write_jdbc,
)
