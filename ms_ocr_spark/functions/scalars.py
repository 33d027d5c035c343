"""Scalar column helpers mirroring the reference's utility functions
(SURVEY.md §2.7 F6/F9/F10/F12/F13) — all JVM-side builtins."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_basename(path: Column | str) -> Column:
    """Basename without extension (reference F6, `engine_tesseract/main.py:120`)."""
    c = F.col(path) if isinstance(path, str) else path
    base = F.element_at(F.split(c, "/"), -1)
    return F.regexp_replace(base, "\\.[^.]*$", "")


def file_extension(path: Column | str) -> Column:
    """Lowercased extension ('' when none) — `HelperSrc.ts:191-192`."""
    c = F.col(path) if isinstance(path, str) else path
    base = F.element_at(F.split(c, "/"), -1)
    return F.when(
        base.contains("."), F.lower(F.element_at(F.split(base, "\\."), -1))
    ).otherwise(F.lit(""))


def stable_doc_uid(doc_id: Column | str, job_id: str) -> Column:
    """Deterministic lineage uid (replaces the reference's time+random
    uniqueId, `HelperSrc.ts:167-172` — determinism beats randomness for
    resumable batch lineage)."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return F.sha2(F.concat(F.lit(f"{job_id}:"), c.cast("string")), 256)


def b64(col: Column | str) -> Column:
    """Base64 payload encoding (reference F10, `Ocr.ts:205`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(c)


def strip_ansi(col: Column | str) -> Column:
    """Remove ANSI escape sequences (reference F13, `HelperSrc.ts:517-521`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "\\x1b\\[[0-9;]*[a-zA-Z]", "")


def iso_ts(col: Column | str) -> Column:
    """ISO-8601 formatting (reference F12 locale formatting analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS")
