"""``python -m vid_dup_finder_lib_tpu.app`` — the vid-dup-finder CLI."""

import sys

from .app_fns import run_app

if __name__ == "__main__":
    sys.exit(run_app())
