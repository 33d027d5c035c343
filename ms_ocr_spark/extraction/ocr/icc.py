"""Minimal ICC profile builder/parser (ICC.1 v2 'desc' tag only).

PNG's iCCP chunk carries the profile NAME outside the profile, but JPEG
(APP2 `ICC_PROFILE`) and TIFF (tag 34675 InterColorProfile) embed raw
profile bytes only — the human-readable name lives in the profile's
'desc' tag.  The reference keeps the ICC profile for every decode
(`/root/reference/src/library/image_processor/main.py:58-63`); this
module is just enough of the public ICC spec to round-trip a description
string so `media_image_metadata.icc_name` has parity across all three
container formats (VERDICT r4 item 5).
"""

from __future__ import annotations

import struct


def icc_profile(name: str) -> bytes:
    """Spec-shaped minimal monochrome display profile whose v2 'desc'
    tag carries `name` (ASCII, NUL-terminated per spec)."""
    ascii_bytes = name.encode("ascii") + b"\0"
    desc = (
        b"desc"
        + b"\0" * 4
        + struct.pack(">I", len(ascii_bytes))
        + ascii_bytes
    )
    desc += b"\0" * (-len(desc) % 4)  # 4-byte tag alignment
    tag_table = (
        struct.pack(">I", 1) + b"desc" + struct.pack(">II", 144, len(desc))
    )
    size = 128 + len(tag_table) + len(desc)
    header = (
        struct.pack(">I", size)  # profile size
        + b"none"  # preferred CMM
        + struct.pack(">I", 0x02100000)  # version 2.1
        + b"mntr"  # device class: display
        + b"GRAY"  # data colour space
        + b"XYZ "  # PCS
        + b"\0" * 12  # creation date
        + b"acsp"  # profile file signature
    )
    header = header.ljust(128, b"\0")
    return header + tag_table + desc


def icc_profile_name(profile: bytes | None) -> str | None:
    """Extract the ASCII description from an ICC v2 'desc' tag; None for
    anything that is not a parseable profile (garbage degrades to a null
    side-value, never an error — quarantine-path contract)."""
    if not profile or len(profile) < 132 or profile[36:40] != b"acsp":
        return None
    try:
        (n_tags,) = struct.unpack_from(">I", profile, 128)
        off = 132
        for _ in range(min(n_tags, 1024)):
            if off + 12 > len(profile):
                return None
            sig, toff, _tsize = struct.unpack_from(">4sII", profile, off)
            off += 12
            if sig == b"desc" and profile[toff : toff + 4] == b"desc":
                (count,) = struct.unpack_from(">I", profile, toff + 8)
                raw = profile[toff + 12 : toff + 12 + count]
                name = raw.split(b"\0")[0].decode("ascii", "replace")
                return name or None
    except (struct.error, IndexError):
        return None
    return None
