#!/bin/sh
# Build the --py-files zip for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/abot_dotnet_core_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/abot_dotnet_core_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("abot_dotnet_core_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/abot_dotnet_core_spark.zip")
EOF
