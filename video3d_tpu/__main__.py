"""``python -m video3d_tpu`` runs the depth tool (reference __main__.py:3)."""

import sys

from video3d_tpu.cli.depth import main

if __name__ == "__main__":
    sys.exit(main())
