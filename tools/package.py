"""Build htmlx.zip for spark-submit --py-files."""

import os
import sys
import zipfile

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = os.path.join(root, "htmlx.zip")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, _dirs, files in os.walk(os.path.join(root, "htmlx")):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                z.write(p, os.path.relpath(p, root))
print(out)
