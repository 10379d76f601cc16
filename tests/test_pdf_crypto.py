"""PDF standard-security-handler + predictor robustness (VERDICT r3 #2).

The reference opens encrypted PDFs through pdfplumber/pypdf
(deepdoc/parser/pdf_parser.py:1006-1129); this exercises the
from-scratch equivalents in ragflow_spark/parsers/pdf_crypto.py and
their integration in parsers/pdf_chars.py: an encrypted or
predictor-filtered twin of a fixture document must extract EXACTLY the
same positioned chars / text as the plain original.
"""

from __future__ import annotations

import re
import zlib

import pytest

from ragflow_spark.data.pdfgen import (
    encrypt_pdf,
    flate_predictor_stream,
    make_doc_pdf,
)
from ragflow_spark.parsers import pdf_crypto as pc
from ragflow_spark.parsers.pdf import extract_pdf_text
from ragflow_spark.parsers.pdf_chars import pdf_pages_chars

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def _chars_sig(pdf: bytes) -> list[tuple]:
    return [
        (c["text"], round(c["x0"], 3), round(c["top"], 3))
        for p in pdf_pages_chars(pdf)
        for c in p["chars"]
    ]


# -- published algorithm vectors -------------------------------------------


def test_rc4_vectors():
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert (
        pc.rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )
    # symmetric
    assert pc.rc4(b"Key", pc.rc4(b"Key", b"roundtrip")) == b"roundtrip"


def test_aes_fips197_vectors():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = pc.AES(key).encrypt_block(pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert pc.AES(key).decrypt_block(ct) == pt
    key256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    ct256 = pc.AES(key256).encrypt_block(pt)
    assert ct256.hex() == "8ea2b7ca516745bfeafc49904b496089"  # FIPS-197 C.3
    assert pc.AES(key256).decrypt_block(ct256) == pt


def test_aes_cbc_roundtrip_various_lengths():
    key = b"0123456789abcdef"
    for n in (0, 1, 15, 16, 17, 64, 100):
        data = bytes(range(256))[:n] * 2
        enc = pc.aes_cbc_encrypt(key, b"\x07" * 16, data)
        assert pc.aes_cbc_decrypt(key, enc) == data


def test_algorithm7_owner_password_recovers_user_padding():
    for r, bits in ((2, 40), (3, 128), (4, 128)):
        o = pc.compute_o(b"ownpw", b"userpw", r, bits)
        padded = pc.recover_user_password(o, b"ownpw", r, bits)
        assert padded == (b"userpw" + pc.PAD)[:32]


def test_verify_user_password_self_consistent():
    for r, bits in ((2, 40), (3, 128), (4, 128)):
        o = pc.compute_o(b"owner", b"", r, bits)
        id0 = b"0123456789abcdef"
        key = pc.compute_key(o, -3904, id0, r, bits, True, b"")
        u = pc.compute_u(key, id0, r)
        assert pc.verify_user_password(o, u, -3904, id0, r, bits, True) == key
        assert (
            pc.verify_user_password(o, u, -3904, id0, r, bits, True, b"wrong")
            is None
        )


# -- end-to-end encrypted twins --------------------------------------------


@pytest.mark.parametrize(
    "kwargs",
    [
        {"r": 2},  # RC4-40, V1
        {"r": 3, "length": 128},  # RC4-128, V2
        {"r": 4, "length": 128, "aes": True},  # AES-128-CBC, V4 /AESV2
    ],
    ids=["rc4-40", "rc4-128", "aes-128"],
)
def test_encrypted_twin_extracts_identically(kwargs):
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, **kwargs)
    assert enc != plain
    # the ciphertext must not leak the plaintext stream bytes
    assert b"(alpha" not in enc
    assert _chars_sig(enc) == _chars_sig(plain)
    assert extract_pdf_text(enc) == extract_pdf_text(plain)
    assert extract_pdf_text(plain)  # non-empty guard


def test_encrypted_with_real_password_yields_no_chars():
    """Documents needing a non-empty password stay closed (the
    conservative path: no chars, upstream text-column fallback)."""
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, r=3, length=128, user_pw=b"secret")
    assert _chars_sig(plain)
    assert _chars_sig(enc) == []


def test_empty_owner_password_route():
    """O built from an empty owner password with a non-empty user
    password: openable via Algorithm 7 at the crypto layer."""
    o = pc.compute_o(b"", b"userpw", 3, 128)
    padded = pc.recover_user_password(o, b"", 3, 128)
    assert padded == (b"userpw" + pc.PAD)[:32]


# -- predictors -------------------------------------------------------------


def _content_stream_of(pdf: bytes) -> tuple[bytes, bytes]:
    """(whole object bytes, payload) of the first content stream."""
    m = re.search(
        rb"(\d+ 0 obj << /Length \d+ >> stream\n)(.*?)(\nendstream endobj)",
        pdf,
        re.DOTALL,
    )
    assert m
    return m.group(0), m.group(2)


@pytest.mark.parametrize("predictor", [2, 12], ids=["tiff", "png"])
def test_predictor_filtered_twin(predictor):
    plain = make_doc_pdf(WORDS)
    whole, payload = _content_stream_of(plain)
    enc_payload, parms = flate_predictor_stream(payload, predictor, columns=24)
    num = whole.split(b" ", 1)[0]
    repl = (
        num + b" 0 obj << /Length " + str(len(enc_payload)).encode()
        + b" /Filter /FlateDecode " + parms + b" >> stream\n"
        + enc_payload + b"\nendstream endobj"
    )
    twin = plain.replace(whole, repl)
    sig_plain, sig_twin = _chars_sig(plain), _chars_sig(twin)
    assert sig_twin == sig_plain
    assert extract_pdf_text(twin) == extract_pdf_text(plain)


def test_png_predictor_undo_reverses_forward_transform():
    from ragflow_spark.parsers.pdf_chars import _predictor_undo

    data = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(24 * 10))
    for predictor, columns in ((12, 24), (2, 24), (12, 7)):
        enc, parms = flate_predictor_stream(data, predictor, columns)
        m = re.search(rb"/DecodeParms (<<.*?>>)", parms)
        out = _predictor_undo(zlib.decompress(enc), m.group(1))
        assert out[: len(data)] == data  # PNG zero-pads the last row


# -- /Length-preferred stream extents (ADVICE r3 #1) ------------------------


def test_endstream_bytes_inside_payload_with_length():
    """A payload legally containing the byte sequence '\\nendstream'
    must not truncate when /Length declares the true extent."""
    payload = (
        b"BT /F1 12 Tf 72 720 Td (AAA) Tj ET\n"
        b"endstream was here as raw bytes\n"
        b"BT /F1 12 Tf 72 700 Td (BBB) Tj ET"
    )
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(payload)).encode()
        + b" >> stream\n" + payload + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj",
    ]
    pdf = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    text = "".join(c["text"] for p in pdf_pages_chars(pdf) for c in p["chars"])
    assert "AAA" in text and "BBB" in text


def test_indirect_length_resolves():
    payload = b"BT /F1 12 Tf 72 720 Td (XY) Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length 6 0 R >> stream\n" + payload
        + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj",
        b"6 0 obj " + str(len(payload)).encode() + b" endobj",
    ]
    pdf = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    text = "".join(c["text"] for p in pdf_pages_chars(pdf) for c in p["chars"])
    assert text == "XY"


# -- nested arrays in the content lexer (ADVICE r3 #2) ----------------------


def test_nested_array_does_not_break_tj_state():
    payload = (
        b"BT /F1 12 Tf 72 720 Td "
        b"/MC1 << /K [ [ 1 2 ] 3 ] >> BDC "
        b"[(AB) -100 (CD)] TJ EMC ET"
    )
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(payload)).encode()
        + b" >> stream\n" + payload + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj",
    ]
    pdf = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    text = "".join(c["text"] for p in pdf_pages_chars(pdf) for c in p["chars"])
    assert text == "ABCD"


# -- round-4 self-review regressions ----------------------------------------


def _simple_pdf(payload: bytes) -> bytes:
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(payload)).encode()
        + b" >> stream\n" + payload + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj",
    ]
    return (
        b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    )


_CF_GROUP = b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>"


def test_qpdf_style_encrypt_dict_key_order():
    """qpdf serializes /Encrypt keys alphabetically, so the /CF
    sub-dict (whose /Length 16 is a key size in BYTES) precedes the
    top-level /Length 128 — the key-bits lookup must not match the
    nested entry."""
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, r=4, aes=True)
    src = b"/V 4 /R 4 /Length 128 " + _CF_GROUP
    dst = _CF_GROUP + b" /V 4 /R 4 /Length 128"
    assert src in enc
    assert _chars_sig(enc.replace(src, dst, 1)) == _chars_sig(plain)


def test_v4_missing_toplevel_length_defaults_to_128():
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, r=4, aes=True)
    enc2 = enc.replace(b" /Length 128 " + _CF_GROUP, b" " + _CF_GROUP, 1)
    assert enc2 != enc
    assert _chars_sig(enc2) == _chars_sig(plain)


def test_unsigned_permissions_value():
    """Many writers serialize /P as the unsigned 32-bit form (e.g.
    4294963392 for -3904); the key derivation must pack the same LE
    bytes either way."""
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, r=3)
    enc2 = enc.replace(b"/P -3904", b"/P 4294963392", 1)
    assert enc2 != enc
    assert _chars_sig(enc2) == _chars_sig(plain)


def test_v4_absent_stmf_means_identity_streams():
    """ISO 32000-1 Table 20: /StmF defaults to Identity for V4+, so an
    encrypt dict without /StmF over PLAINTEXT streams must leave them
    untouched (decrypting them would corrupt valid content)."""
    plain = make_doc_pdf(WORDS)
    enc = encrypt_pdf(plain, r=4, aes=True)
    em = re.search(
        rb"(\d+) 0 obj (<< /Filter /Standard.*?>>) endobj\n", enc, re.DOTALL
    )
    dict_body = em.group(2).replace(b" /StmF /StdCF /StrF /StdCF", b"")
    assert dict_body != em.group(2)
    encobj = em.group(1) + b" 0 obj " + dict_body + b" endobj\n"
    idm = re.search(rb"/ID \[[^\]]*\] ", enc)
    graft = encobj + b"trailer << /Encrypt " + em.group(1) + b" 0 R " + idm.group(0)
    hybrid = plain.replace(b"trailer <<", graft, 1)
    assert hybrid != plain
    assert _chars_sig(hybrid) == _chars_sig(plain)


def test_encrypted_ciphertext_containing_endstream_with_indirect_length():
    """RC4 is keystream XOR, so the test engineers a ciphertext that
    CONTAINS b'\\nendstream' mid-payload (inside a comment in the
    plaintext); with /Length made indirect, the extent must resolve
    through the object map — the first-'endstream' regex would
    truncate the ciphertext and lose the second line."""
    from ragflow_spark.parsers.pdf_crypto import rc4

    filler = b"A" * 32
    def build(f):
        return _simple_pdf(
            b"BT /F1 12 Tf 72 720 Td (XY) Tj ET\n%" + f
            + b"\nBT /F1 12 Tf 72 700 Td (ZW) Tj ET"
        )

    plain = build(filler)
    enc = encrypt_pdf(plain, r=3)
    sm = re.search(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", enc, re.DOTALL)
    ct = sm.group(1)
    pt = re.search(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", plain, re.DOTALL).group(1)
    assert len(ct) == len(pt)
    ks = bytes(a ^ b for a, b in zip(pt, ct))  # keystream, payload-independent
    want = b"\nendstream"
    pos0 = pt.find(filler)
    engineered = None
    for off in range(len(filler) - len(want)):
        i = pos0 + off
        cand = bytes(k ^ w for k, w in zip(ks[i : i + len(want)], want))
        if not any(b in cand for b in b"\r\n()%\\"):
            engineered = filler[:off] + cand + filler[off + len(want):]
            break
    assert engineered is not None
    enc2 = encrypt_pdf(build(engineered), r=3)
    # RC4 preserves length; slice the true ciphertext extent directly
    # (the non-greedy probe regex would fall into its own trap here)
    n = len(pt)
    start = enc2.find(b"stream\n") + len(b"stream\n")
    ct2 = enc2[start : start + n]
    assert b"\nendstream" in ct2  # the trap is armed
    enc3 = enc2.replace(
        b"/Length " + str(n).encode() + b" >> stream", b"/Length 99 0 R >> stream", 1
    )
    assert enc3 != enc2
    enc3 = enc3.replace(
        b"trailer <<", str(99).encode() + b" 0 obj " + str(n).encode()
        + b" endobj\ntrailer <<", 1
    )
    text = "".join(c["text"] for p in pdf_pages_chars(enc3) for c in p["chars"])
    assert "XY" in text and "ZW" in text


def test_flate_bomb_is_capped_not_oom():
    """A ~100 KB stream that inflates past the 64 MiB cap must fail the
    filter chain (page falls back) instead of materializing gigabytes."""
    import zlib as _z

    bomb = _z.compress(b"\x00" * (80 << 20))  # ~80 MiB of zeros
    body = (
        b"<< /Length " + str(len(bomb)).encode()
        + b" /Filter /FlateDecode >> stream\n" + bomb + b"\nendstream"
    )
    from ragflow_spark.parsers.pdf_chars import _stream_data

    assert _stream_data(b"9 0 obj " + body + b" endobj", {}) is None
    # a normal-size flate stream still round-trips
    ok = _z.compress(b"BT (x) Tj ET")
    body2 = (
        b"<< /Length " + str(len(ok)).encode()
        + b" /Filter /FlateDecode >> stream\n" + ok + b"\nendstream"
    )
    assert _stream_data(b"9 0 obj " + body2 + b" endobj", {}) == b"BT (x) Tj ET"


# -- hostile /Encrypt dictionaries (crafted, not random) ---------------------


def _hostile_encrypted_pdf(enc_dict: bytes) -> bytes:
    payload = b"BT /F1 12 Tf 72 720 Td (hi) Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(payload)).encode()
        + b" >> stream\n" + payload + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj",
        b"8 0 obj << " + enc_dict + b" >> endobj",
    ]
    return (
        b"%PDF-1.4\n" + b"\n".join(objs)
        + b"\ntrailer << /Root 1 0 R /Encrypt 8 0 R /ID [<"
        + b"AB" * 16 + b"> <" + b"AB" * 16 + b">] >>\n%%EOF"
    )


def test_hostile_tiny_length_does_not_divide_by_zero():
    """/Length 7 -> 0 key bytes: the owner-password recovery route
    (Algorithm 7) used length_bits // 8 unclamped, so RC4 ran with an
    empty key (key[i % 0]).  Must degrade to "can't verify" instead."""
    pdf = _hostile_encrypted_pdf(
        b"/Filter /Standard /V 2 /R 3 /Length 7 /P -3904"
        b" /O <" + b"11" * 32 + b"> /U <" + b"22" * 32 + b">"
    )
    pages = pdf_pages_chars(pdf)  # must not raise
    assert isinstance(pages, list)
    # unverifiable handler -> conservative None decryptor; the (actually
    # plaintext) content still parses
    assert pc.recover_user_password(b"\x11" * 32, b"", 3, 7) is not None


def test_hostile_r6_short_ue_returns_none():
    """An attacker controls /U and can write the empty-password hash
    into it themselves, so the hash check does not gate a truncated
    /UE; a 17-byte /UE used to feed AES a 1-byte block (IndexError)."""
    vsalt, ksalt = b"\x01" * 8, b"\x02" * 8
    u = pc._hash_2b(b"", vsalt, b"") + vsalt + ksalt
    assert pc.verify_user_password_r6(u, b"\x00" * 17) is None
    assert pc.verify_user_password_r6(u, b"") is None
    pdf = _hostile_encrypted_pdf(
        b"/Filter /Standard /V 5 /R 6 /StmF /StdCF /P -3904"
        b" /U <" + u.hex().encode() + b"> /UE <" + b"00" * 17 + b">"
    )
    pages = pdf_pages_chars(pdf)  # must not raise
    assert isinstance(pages, list)
