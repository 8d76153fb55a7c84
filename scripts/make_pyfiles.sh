#!/bin/sh
# Package olkg for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/olkg.zip
python - <<'EOF'
import zipfile, pathlib
with zipfile.ZipFile("dist/olkg.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path("olkg").glob("*.py")):
        z.write(p, str(p))
print("wrote dist/olkg.zip")
EOF
