from hadoop_distexec_spark.cli import main

raise SystemExit(main())
