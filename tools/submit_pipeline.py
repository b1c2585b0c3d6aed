"""spark-submit driver for the conflation pipeline (north_rule: the job
ships as ``spark-submit --py-files conflation_spark.zip`` to a
multi-executor cluster; the same invocation runs locally):

    python -m zipfile -c /tmp/conflation_spark.zip conflation_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files /tmp/conflation_spark.zip \
        tools/submit_pipeline.py --input <data_dir_or_table> --work <work_dir>

The package resolves from the --py-files zip (no repo checkout needed on
executors); ``conflation_spark.__main__`` is reused so the CLI flags stay
identical to ``python -m conflation_spark``. Tested end-to-end by
tests/test_pipeline.py::test_spark_submit_py_files_e2e.
"""

from conflation_spark.__main__ import main

if __name__ == "__main__":
    main()
