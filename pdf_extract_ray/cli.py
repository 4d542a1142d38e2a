"""CLI mirroring the reference's examples/extract.rs:13-44:

    python -m pdf_extract_ray.cli input.pdf [txt|html|svg]

Loads the document, prints metadata, picks the output device by format,
auto-decrypts with the empty password, and writes the output next to the
input with the new extension.
"""
from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m pdf_extract_ray.cli <input.pdf> [txt|html|svg]",
              file=sys.stderr)
        return 2
    path = argv[0]
    fmt = argv[1] if len(argv) > 1 else "txt"
    from .engine import (HTMLOutput, PlainTextOutput, SVGOutput, get_metadata,
                         load_document, output_doc)
    from .engine.api import maybe_decrypt

    with open(path, "rb") as f:
        buf = f.read()
    doc = load_document(buf)
    for k, v in get_metadata(doc).items():
        print(f"{k}: {v}")
    maybe_decrypt(doc)
    if fmt == "txt":
        dev = PlainTextOutput()
    elif fmt == "html":
        dev = HTMLOutput()
    elif fmt == "svg":
        dev = SVGOutput()
    else:
        print(f"unknown format {fmt!r}", file=sys.stderr)
        return 2
    output_doc(doc, dev)
    out_path = path.rsplit(".", 1)[0] + "." + fmt
    content = (dev.get_text() if fmt == "txt"
               else dev.get_html() if fmt == "html" else dev.get_svg())
    with open(out_path, "w") as f:
        f.write(content)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
