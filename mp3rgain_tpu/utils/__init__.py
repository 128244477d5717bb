"""Shared utilities: terminal color, progress reporting, output rendering."""

from .term import Color, colorize, supports_color
from .progress import ProgressBar

__all__ = ["Color", "colorize", "supports_color", "ProgressBar"]
