"""spark-submit primary script (north rule ship path):

    zip -r pkg.zip cookieblock_consent_classifier_spark
    spark-submit --py-files pkg.zip scripts/submit_extract.py \
        --input synth:N --output DIR [--features-json CFG --resources-dir DIR]

The package arrives via --py-files (driver + executor sys.path); this
file only dispatches to the CLI. Exercised end-to-end by
tests/test_spark_submit.py.
"""

from cookieblock_consent_classifier_spark.cli import main

if __name__ == "__main__":
    main()
