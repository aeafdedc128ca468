"""Example: grep a file (the reference's examples/grep.rs).

    python examples/grep.py dynamic "Protected Mode" data/i386.txt
"""

import sys

sys.path.insert(0, ".")

from sliceslice_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
