import sys

from mpopis_tpu.harness.cli import main

if __name__ == "__main__":
    sys.exit(main())
