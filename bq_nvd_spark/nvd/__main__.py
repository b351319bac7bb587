"""``python -m bq_nvd_spark.nvd`` — see cli.py."""

from bq_nvd_spark.nvd.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
