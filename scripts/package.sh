#!/bin/sh
# Build the spark-submit artifact (north rule: spark-submit --py-files on
# a multi-executor cluster).
#
#   sh scripts/package.sh
#   spark-submit --py-files dist/etl_spark.zip scripts/submit_replay.py \
#       --log /path/to/changes --table /path/to/table
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/etl_spark.zip
python -c "
import shutil
shutil.make_archive('dist/etl_spark', 'zip', '.', 'etl_spark')
print('dist/etl_spark.zip')
"
