"""Application layer: CLI, config, outputs, match database.

Mirrors the reference's ``vid_dup_finder_app`` (SURVEY.md section 2.5): the
``vid-dup-finder`` command-line tool over the library — hash cache
management, disk search, text/JSON/thumbnail outputs, and the
human-curated match database.
"""

from .app_cfg import AppCfg, Sorting
from .app_fns import run_app

__all__ = ["AppCfg", "Sorting", "run_app"]
