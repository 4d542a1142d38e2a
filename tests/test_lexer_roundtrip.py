"""Property test: serializing any PDF object tree and re-parsing it must
round-trip exactly (floats through the f32 funnel)."""
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pdf_extract_ray.engine.lexer import Lexer
from pdf_extract_ray.engine.objects import NULL, Name, PdfNull, PdfString, Ref, f32

# name bytes: regular chars only (escapes are produced by the writer)
_name_bytes = st.binary(min_size=1, max_size=12).filter(
    lambda b: 0 not in b)
_string_bytes = st.binary(min_size=0, max_size=40)


def objects(depth=3):
    base = st.one_of(
        st.integers(min_value=-2**31, max_value=2**31 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=32,
                  min_value=-1e6, max_value=1e6),
        st.booleans(),
        st.just(NULL),
        _string_bytes.map(PdfString),
        _name_bytes.map(Name),
        st.builds(Ref, st.integers(1, 99999), st.integers(0, 99)),
    )
    if depth <= 0:
        return base
    return st.one_of(
        base,
        st.lists(objects(depth - 1), max_size=4),
        st.dictionaries(_name_bytes, objects(depth - 1), max_size=4),
    )


def serialize(o) -> bytes:
    if isinstance(o, PdfNull):
        return b"null"
    if isinstance(o, bool):
        return b"true" if o else b"false"
    if isinstance(o, Name):
        out = b"/"
        for c in bytes(o):
            if c in b"()<>[]{}/%#\x00\t\n\x0c\r " or c < 0x21 or c > 0x7E:
                out += b"#%02X" % c
            else:
                out += bytes([c])
        return out
    if isinstance(o, PdfString):
        return b"<" + bytes(o).hex().encode() + b">"
    if isinstance(o, Ref):
        return f"{o.num} {o.gen} R".encode()
    if isinstance(o, int):
        return str(o).encode()
    if isinstance(o, float):
        return repr(o).encode()
    if isinstance(o, list):
        return b"[ " + b" ".join(serialize(x) for x in o) + b" ]"
    if isinstance(o, dict):
        return (b"<< " + b" ".join(serialize(Name(k)) + b" " + serialize(v)
                                   for k, v in o.items()) + b" >>")
    raise AssertionError(o)


def canon(o):
    """Expected parse result: floats go through f32; ints stay ints."""
    if isinstance(o, float):
        v = f32(o)
        return int(v) if v == int(v) and "e" not in repr(o).lower() and "." not in repr(o) else v
    if isinstance(o, list):
        return [canon(x) for x in o]
    if isinstance(o, dict):
        return {k: canon(v) for k, v in o.items()}
    return o


@settings(max_examples=300, deadline=None)
@given(objects())
def test_roundtrip(o):
    data = serialize(o)
    parsed = Lexer(data).parse_object()
    expected = canon(o)
    if isinstance(expected, float):
        assert isinstance(parsed, float) and parsed == f32(expected)
    else:
        assert parsed == expected


@settings(max_examples=100, deadline=None)
@given(st.lists(objects(2), min_size=1, max_size=5))
def test_roundtrip_sequence(objs):
    """Multiple serialized objects in sequence parse back in order."""
    data = b"  ".join(serialize(o) for o in objs)
    lx = Lexer(data)
    for o in objs:
        parsed = lx.parse_object()
        expected = canon(o)
        if isinstance(expected, float):
            assert parsed == f32(expected)
        else:
            assert parsed == expected
