#!/usr/bin/env bash
# Package ms_ocr_spark for spark-submit --py-files (north rule).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ms_ocr_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/ms_ocr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ms_ocr_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ms_ocr_spark.zip")
EOF
