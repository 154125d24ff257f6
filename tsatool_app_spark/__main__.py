from tsatool_app_spark.cli import main

raise SystemExit(main())
