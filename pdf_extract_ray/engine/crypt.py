"""Standard security handler (PDF 32000-1:2008 §7.6): RC4 (V1/V2, and V4
crypt filters using V2).  AES (AESV2/AESV3) is not implemented yet — it
raises a clear error and the row is totalized to status='error' upstream.

The reference attempts an empty-password decrypt automatically
(`maybe_decrypt`, src/lib.rs:2230-2244); same default here.
"""
from __future__ import annotations

import hashlib
import struct
from typing import Optional

from .objects import Name, PdfError, PdfString, Ref, Stream, maybe_deref

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


class StandardSecurityHandler:
    def __init__(self, doc, password: str = ""):
        enc_ref = doc.trailer.get(b"Encrypt")
        enc = maybe_deref(doc, enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("bad Encrypt dict")
        filt = enc.get(b"Filter")
        if not (isinstance(filt, Name) and bytes(filt) == b"Standard"):
            raise PdfError(f"unsupported security handler {filt!r}")
        self.v = enc.get(b"V", 0)
        self.r = enc.get(b"R", 2)
        length = enc.get(b"Length", 40)
        self.key_len = (length if isinstance(length, int) else 40) // 8
        o = enc.get(b"O")
        u = enc.get(b"U")
        p = enc.get(b"P", -1)
        if not isinstance(o, PdfString) or not isinstance(u, PdfString):
            raise PdfError("missing O/U")
        ids = maybe_deref(doc, doc.trailer.get(b"ID"))
        id0 = bytes(ids[0]) if isinstance(ids, list) and ids and isinstance(ids[0], PdfString) else b""
        self.aes = False
        if self.v == 4 or self.v == 5:
            cf = maybe_deref(doc, enc.get(b"CF")) or {}
            stmf = enc.get(b"StmF")
            stmf_name = bytes(stmf) if isinstance(stmf, Name) else b"Identity"
            cfd = maybe_deref(doc, cf.get(stmf_name)) if isinstance(cf, dict) else None
            cfm = cfd.get(b"CFM") if isinstance(cfd, dict) else None
            if isinstance(cfm, Name) and bytes(cfm) in (b"AESV2", b"AESV3"):
                self.aes = True
        if self.v == 5 or self.aes:
            raise PdfError("AES-encrypted PDFs not supported yet (AESV2/AESV3)")
        if self.v not in (1, 2, 4):
            raise PdfError(f"unsupported encryption V={self.v}")

        # Algorithm 2: compute the encryption key
        pw = password.encode("latin-1", "replace")
        padded = (pw + PAD)[:32]
        h = hashlib.md5()
        h.update(padded)
        h.update(bytes(o)[:32])
        h.update(struct.pack("<i", p if isinstance(p, int) else -1))
        h.update(id0)
        if self.r >= 4 and enc.get(b"EncryptMetadata") is False:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = self.key_len if self.r >= 3 else 5
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        self.key = key[:n]

        # verify the password via U (Algorithm 4/5); empty password must
        # actually validate or we report IncorrectPassword like lopdf
        if not self._check_user_password(bytes(u), id0):
            raise PdfError("IncorrectPassword")

    def _check_user_password(self, u: bytes, id0: bytes) -> bool:
        if self.r == 2:
            expect = rc4(self.key, PAD)
            return expect == u[:32]
        h = hashlib.md5()
        h.update(PAD)
        h.update(id0)
        step = rc4(self.key, h.digest())
        for i in range(1, 20):
            k = bytes(b ^ i for b in self.key)
            step = rc4(k, step)
        return step == u[:16]

    def object_key(self, num: int, gen: int) -> bytes:
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", gen)[:2])
        n = min(len(self.key) + 5, 16)
        return h.digest()[:n]

    def decrypt_bytes(self, data: bytes, num: int, gen: int) -> bytes:
        return rc4(self.object_key(num, gen), data)


def decrypt_document(doc, password: str = "") -> None:
    """Install a decryptor on the document; objects are decrypted lazily at
    load time (strings and stream bytes of top-level objects)."""
    handler = StandardSecurityHandler(doc, password)
    doc._crypt = handler
    doc._cache.clear()
    doc._objstm_cache.clear()
    del doc.trailer[b"Encrypt"]


def decrypt_object(handler: StandardSecurityHandler, obj, num: int, gen: int):
    """Recursively decrypt strings (and stream payloads) in an object."""
    if isinstance(obj, PdfString):
        return PdfString(handler.decrypt_bytes(bytes(obj), num, gen))
    if isinstance(obj, list):
        return [decrypt_object(handler, x, num, gen) for x in obj]
    if isinstance(obj, dict):
        return {k: decrypt_object(handler, v, num, gen) for k, v in obj.items()}
    if isinstance(obj, Stream):
        d = decrypt_object(handler, obj.dict, num, gen)
        t = d.get(b"Type")
        if isinstance(t, Name) and bytes(t) == b"XRef":
            return Stream(d, obj.raw)  # xref streams are never encrypted
        return Stream(d, handler.decrypt_bytes(obj.raw, num, gen))
    return obj
