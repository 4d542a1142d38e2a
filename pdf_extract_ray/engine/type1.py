"""Type1 font program encoding extraction.

Equivalent of the type1-encoding-parser crate used at reference
src/lib.rs:391: pull the /Encoding overrides (`dup <code> /<name> put`)
out of the cleartext portion of an embedded Type1 font program.
Returns [(code, glyph_name_bytes)]; /Encoding StandardEncoding -> [].
"""
from __future__ import annotations

import re
from typing import List, Tuple

from .objects import PdfError

_ENC_RE = re.compile(rb"/Encoding\s+(\S+)")
_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/\]{}()<>\[]+)\s+put")


def parse_type1_encoding(data: bytes) -> List[Tuple[int, bytes]]:
    # only the cleartext portion (before eexec) holds the encoding
    eexec = data.find(b"eexec")
    clear = data[:eexec] if eexec >= 0 else data
    m = _ENC_RE.search(clear)
    if m is None:
        raise PdfError("no /Encoding in Type1 font program")
    if m.group(1).startswith(b"StandardEncoding"):
        return []
    out: List[Tuple[int, bytes]] = []
    for dm in _DUP_RE.finditer(clear, m.start()):
        out.append((int(dm.group(1)), dm.group(2)))
    return out
