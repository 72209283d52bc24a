"""Structured logging (replaces the reference's std::cout tracing).

The reference logs scene stats, material/light dumps, a render-settings
banner and progress percentages straight to stdout (SURVEY.md §5). We route
the same information through the stdlib logging module so callers can
silence or redirect it; the CLI installs a plain-stdout handler to keep the
reference's console feel.
"""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def configure_cli_logging(level=logging.INFO) -> None:
    """Plain `message`-only stdout logging, reference-console style."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(message)s"))
    root = logging.getLogger("path_tracer_ai_tpu")
    root.addHandler(handler)
    root.setLevel(level)
    _CONFIGURED = True


def render_banner(log: logging.Logger, settings) -> None:
    """Mirrors the render-settings banner (renderer.hpp:41-44)."""
    log.info("Starting render with settings:")
    log.info("Resolution: %dx%d", settings.width, settings.height)
    log.info("Samples per pixel: %d", settings.samples_per_pixel)
    log.info("Max bounces: %d", settings.max_bounces)
