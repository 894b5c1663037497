#!/bin/sh
# Package the engine for `spark-submit --py-files` deployment
# (north-rule deployment mode: multi-executor clusters at N / 4N executors).
#
#   tools/make_pyfiles.sh            # writes dist/go_shapefile_spark.zip
#   spark-submit --py-files dist/go_shapefile_spark.zip your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/go_shapefile_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/go_shapefile_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("go_shapefile_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/go_shapefile_spark.zip")
EOF
