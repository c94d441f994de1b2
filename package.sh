#!/bin/sh
# Build the --py-files artifact for spark-submit (BASELINE.json packaging).
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/go_data_publisher_spark.zip
python -c "
import zipfile, pathlib
with zipfile.ZipFile('dist/go_data_publisher_spark.zip', 'w') as z:
    for p in sorted(pathlib.Path('go_data_publisher_spark').rglob('*.py')):
        z.write(p, p.as_posix())
print('wrote dist/go_data_publisher_spark.zip')
"
echo "usage: spark-submit --py-files dist/go_data_publisher_spark.zip run_pipeline.py <cmd> ..."
