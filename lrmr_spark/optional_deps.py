"""Import-time probes for optional dependencies.

The engine honestly gates features whose libraries may be absent
(media codecs, Delta Lake jars): the Spark-side plumbing is real and
tested everywhere, and the gated step raises ``NotImplementedError``
with a clear message when its dependency is missing — but when the
dependency IS present (a fuller image, a cluster with the jars), the
real path activates automatically. Tests for real paths skip (never
fail) when the probe is negative.
"""

from __future__ import annotations

import importlib.util
import shutil
from functools import lru_cache

__all__ = ["has_module", "has_pil", "has_delta", "has_ffmpeg"]


@lru_cache(maxsize=None)
def has_module(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def has_pil() -> bool:
    """Pillow — real image decode for operators.multimodal."""
    return has_module("PIL")


def has_delta() -> bool:
    """delta-spark pip package (jars still must be on the session
    classpath at JVM launch — see sources.read_delta)."""
    return has_module("delta")


@lru_cache(maxsize=None)
def has_ffmpeg() -> bool:
    """ffmpeg binary — real video frame extraction."""
    return shutil.which("ffmpeg") is not None
