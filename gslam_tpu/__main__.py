"""``python -m gslam_tpu <app> ...`` — the gslam binary analog."""

import sys

from gslam_tpu.app.cli import main

if __name__ == "__main__":
    sys.exit(main())
