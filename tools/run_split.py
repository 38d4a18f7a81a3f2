"""spark-submit application entry (north_rule deployment path):

    spark-submit --master <cluster> \
        --py-files dist/osm_history_splitter_spark.zip \
        tools/run_split.py --input IN --config CFG --output OUT [--mode softcut]

A thin launcher around ``osm_history_splitter_spark.splitter.main`` —
the package module uses relative imports, so spark-submit needs a flat
script as the application file while the zip supplies the package.
"""

from osm_history_splitter_spark.splitter import main

if __name__ == "__main__":
    main()
