"""Error taxonomy.

The reference funnels all failures into one thiserror enum handed to a single
error handler that exits the loop (treee/src/lib.rs:45-70, 247-253).  Python
exceptions subsume the mechanism; this module fixes the vocabulary so callers
can catch precisely.
"""

from __future__ import annotations


class TreeeError(Exception):
    """Base class for framework errors (lib.rs Error)."""


class CorruptFile(TreeeError, ValueError):
    """Bad signature / malformed structure (lib.rs Error::CorruptFile).

    Also a ValueError, so pre-taxonomy callers (``except ValueError``) keep
    catching ingest corruption."""


class UnsupportedFormat(TreeeError):
    """Recognized but unimplemented encoding (e.g. exotic LAZ versions)."""


class CapacityExceeded(TreeeError):
    """A static capacity (points, segments, bands, slices) would overflow."""


class NoPoints(TreeeError):
    """An operation that needs points got an empty selection."""
