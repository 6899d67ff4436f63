"""Regenerate the frozen golden outputs for the fixture corpus.

Run ONLY when a semantic change is intended and verified; tests compare the
live core against tests/fixtures/golden.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlx.fixtures import build_golden

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "golden.json")
with open(path, "w") as f:
    json.dump(build_golden(), f, indent=1, ensure_ascii=False, sort_keys=True)
print(f"froze {path}")
