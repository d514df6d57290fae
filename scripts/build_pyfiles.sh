#!/usr/bin/env bash
# Build the --py-files artifact: a zip of the plato_spark package.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/plato_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
# zip only the package sources (no tests, no caches)
python - "$out" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("plato_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote", out)
EOF
