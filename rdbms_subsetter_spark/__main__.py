from rdbms_subsetter_spark.cli import main

raise SystemExit(main())
