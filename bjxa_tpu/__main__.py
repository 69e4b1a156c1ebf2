"""``python -m bjxa_tpu`` — the bjxa CLI."""

import sys

from bjxa_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["bjxa"] + sys.argv[1:]))
