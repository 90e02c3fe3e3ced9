"""Interactive terminal duplicate resolver.

The reference ships an optional Slint GUI for resolving duplicate groups
(``vid_dup_finder/src/app/gui_slint/mod.rs:75-186``: show a group's
entries with file details and thumbnails, accept a keep-expression,
advance through groups).  This build re-imagines it as a TTY carousel
over the headless ``ResolutionThunk`` engine — same resolution
semantics (``resolution_thunk.rs:255-339``'s expression language, trash
with sha-dedup and untrash), driveable both interactively and from a
scripted stdin (tests use a pty).

Controls at the prompt:

* ``<expr>``     — a keep-expression (``1``, ``1 as 2``, ``1 at 2``,
                   ``1 as 2 at 3``, ``u1`` to untrash), applied to the
                   current group
* ``n`` / Enter  — next group (skip)
* ``p``          — previous group
* ``t``          — toggle ANSI thumbnails
* ``q``          — quit

Thumbnails render as 256-color half-block art straight in the terminal
(the reference's thumbnail strip, minus a windowing system).
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field
from typing import IO

from .resolution_thunk import ResolutionThunk

THUMB_COLS = 40  # terminal cells per thumbnail
THUMB_ROWS = 12  # text rows (2 pixel rows per cell with half blocks)


def _ansi_thumb(path: str, cols: int = THUMB_COLS, rows: int = THUMB_ROWS) -> list[str]:
    """One decoded frame -> 256-color half-block art lines."""
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(path)
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        if total > 2:
            cap.set(cv2.CAP_PROP_POS_FRAMES, total // 2)
        ok, img = cap.read()
        if not ok:
            return ["<undecodable>"]
    finally:
        cap.release()
    img = cv2.resize(img, (cols, rows * 2), interpolation=cv2.INTER_AREA)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.int32)

    def c256(px) -> int:
        r, g, b = (int(v) * 5 // 255 for v in px)
        return 16 + 36 * r + 6 * g + b

    lines = []
    for y in range(0, rows * 2, 2):
        row = []
        for x in range(cols):
            top, bot = c256(img[y, x]), c256(img[y + 1, x])
            row.append(f"\x1b[38;5;{top}m\x1b[48;5;{bot}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return lines


def _file_details(path: str) -> str:
    try:
        size = os.path.getsize(path)
        mb = size / 2**20
        return f"{mb:7.2f} MB"
    except OSError:
        return "  <gone>"


@dataclass
class ResolverTui:
    """Carousel over a list of ``ResolutionThunk``s."""

    thunks: list[ResolutionThunk]
    inp: IO[str] = field(default_factory=lambda: sys.stdin)
    out: IO[str] = field(default_factory=lambda: sys.stdout)
    thumbs: bool = False
    cache: object | None = None

    def _println(self, s: str = "") -> None:
        self.out.write(s + "\n")

    def _show_group(self, gi: int) -> None:
        t = self.thunks[gi]
        self._println()
        self._println(
            f"=== group {gi + 1}/{len(self.thunks)}"
            + (
                f"  (max distance {t.max_distance():.3f})"
                if t.hashes and t.max_distance() is not None
                else ""
            )
            + " ==="
        )
        for i, p in enumerate(t.entries):
            trashed = "  [trashed]" if p in t.trashed else ""
            dur = ""
            h = t.hashes.get(p)
            if h is not None and hasattr(h, "duration"):
                dur = f"  {h.duration:5d}s"
            self._println(
                f"  [{i}] {_file_details(p)}{dur}  {p}{trashed}"
            )
            if self.thumbs and os.path.exists(p):
                for line in _ansi_thumb(p):
                    self._println("        " + line)

    def run(self) -> None:
        """Drive the carousel until all groups are visited or 'q'."""
        if not self.thunks:
            self._println("no duplicate groups to resolve")
            return
        gi = 0
        while 0 <= gi < len(self.thunks):
            self._show_group(gi)
            self._println(
                "keep-expr (e.g. '0', '0 as 1', 'u0') | n=next p=prev "
                "t=thumbs q=quit"
            )
            self.out.write("> ")
            self.out.flush()
            line = self.inp.readline()
            if not line:  # EOF: scripted input exhausted
                return
            cmd = line.strip()
            if cmd in ("q", "quit"):
                return
            if cmd in ("", "n", "next", "s", "skip"):
                gi += 1
                continue
            if cmd in ("p", "prev"):
                gi = max(0, gi - 1)
                continue
            if cmd in ("t", "thumbs"):
                self.thumbs = not self.thumbs
                continue
            try:
                for action in self.thunks[gi].resolve(cmd):
                    self._println(action)
                # stay on the group (like the GUI): the user can still
                # untrash or re-resolve, and advances with 'n'
            except (ValueError, OSError) as e:
                self._println(f"error: {e}")
        self._println("all groups visited")


def run_resolver(
    groups,
    cache=None,
    trash_dir: str | None = None,
    inp: IO[str] | None = None,
    out: IO[str] | None = None,
    thumbs: bool | None = None,
) -> ResolverTui:
    """Build and run the TUI over MatchGroups; returns the TUI (tests
    inspect its thunks afterwards)."""
    thunks = [
        ResolutionThunk.from_matchgroup(g, cache=cache, trash_dir=trash_dir)
        for g in groups
    ]
    tui = ResolverTui(
        thunks=thunks,
        inp=inp if inp is not None else sys.stdin,
        out=out if out is not None else sys.stdout,
        thumbs=(
            thumbs
            if thumbs is not None
            else (out is None and sys.stdout.isatty())
        ),
        cache=cache,
    )
    tui.run()
    return tui
