"""Small filesystem helpers shared by the artifact writers."""

from __future__ import annotations

import json
import os


def write_json_atomic(path: str, obj: dict) -> None:
    """Write JSON via tmp + os.replace: a crash mid-write can never leave a
    truncated file that bricks the artifact's manifest check (readers see
    either the old manifest or the new one, never garbage)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)
