import sys

from era_parser_spark.cli import main

sys.exit(main())
