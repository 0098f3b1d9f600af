from icerunner_spark.cli import main

raise SystemExit(main())
