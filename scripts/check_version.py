#!/usr/bin/env python
"""Release gate: package version consistency (the scripts/check-version.sh
analogue, reference scripts/check-version.sh:5-11 — tag must match the
manifest before publish)."""

import re
import sys


def main() -> int:
    pyproject = open("pyproject.toml").read()
    manifest = re.search(r'^version = "([^"]+)"', pyproject, re.M).group(1)
    init = open("sliceslice_tpu/__init__.py").read()
    package = re.search(r'^__version__ = "([^"]+)"', init, re.M).group(1)
    if manifest != package:
        print(
            f"version mismatch: pyproject {manifest} != package {package}",
            file=sys.stderr,
        )
        return 1
    if len(sys.argv) > 1:
        tag = sys.argv[1].lstrip("v")
        if tag != manifest:
            print(f"tag {tag} != version {manifest}", file=sys.stderr)
            return 1
    print(f"version ok: {manifest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
