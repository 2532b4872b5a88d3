from kdcloganalyzer_spark.cli import main

raise SystemExit(main())
