#!/bin/sh
# Build the --py-files artifact for spark-submit shipping (north rule):
#   sh scripts/package.sh && spark-submit --py-files dist/osm_spark.zip \
#       scripts/run_pipeline.py --sf-dir ... --out ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/osm_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/osm_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("osm_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/osm_spark.zip written")
PY
