"""Charset detection: dependency-free equivalent of the reference's
``find_codec`` (rag/nlp/__init__.py:53-71, codec list :32-50).

The reference calls chardet on the first 1 KB but only uses the result to
map a confident "ascii" verdict to "utf-8"; in every other case it falls
through to a fixed-order try-decode cascade.  Pure-ASCII bytes decode as
utf-8 (the cascade's first entry), so the cascade alone is behaviorally
identical — no chardet dependency needed.

Semantics preserved exactly:
* same candidate order,
* each codec tried first on ``blob[:1024]`` then on the whole blob,
* final fallback "utf-8",
* decode of the winning codec with ``errors="ignore"``.
"""

from __future__ import annotations

import codecs
from functools import lru_cache

# Same order as the reference list (rag/nlp/__init__.py:32-50). Names that
# this Python build does not know are skipped at import time.
_CANDIDATES_RAW = [
    "utf-8", "gb2312", "gbk", "utf_16", "ascii", "big5", "big5hkscs",
    "cp037", "cp273", "cp424", "cp437",
    "cp500", "cp720", "cp737", "cp775", "cp850", "cp852", "cp855", "cp856",
    "cp857", "cp858", "cp860", "cp861", "cp862", "cp863", "cp864", "cp865",
    "cp866", "cp869", "cp874", "cp875", "cp932", "cp949", "cp950", "cp1006",
    "cp1026", "cp1125", "cp1140", "cp1250", "cp1251", "cp1252", "cp1253",
    "cp1254", "cp1255", "cp1256", "cp1257", "cp1258", "euc_jp",
    "euc_jis_2004", "euc_jisx0213", "euc_kr", "gb18030", "hz", "iso2022_jp",
    "iso2022_jp_1", "iso2022_jp_2", "iso2022_jp_2004", "iso2022_jp_3",
    "iso2022_jp_ext", "iso2022_kr", "latin_1", "iso8859_2", "iso8859_3",
    "iso8859_4", "iso8859_5", "iso8859_6", "iso8859_7", "iso8859_8",
    "iso8859_9", "iso8859_10", "iso8859_11", "iso8859_13", "iso8859_14",
    "iso8859_15", "iso8859_16", "johab", "koi8_r", "koi8_t", "koi8_u",
    "kz1048", "mac_cyrillic", "mac_greek", "mac_iceland", "mac_latin2",
    "mac_roman", "mac_turkish", "ptcp154", "shift_jis", "shift_jis_2004",
    "shift_jisx0213", "utf_32", "utf_32_be", "utf_32_le", "utf_16_be",
    "utf_16_le", "utf_7", "windows-1250", "windows-1251", "windows-1252",
    "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258", "latin-2",
]


def _known(name: str) -> bool:
    try:
        codecs.lookup(name)
        return True
    except LookupError:
        return False


CANDIDATE_CODECS = [c for c in _CANDIDATES_RAW if _known(c)]


@lru_cache(maxsize=4096)
def _try(codec: str, head: bytes) -> bool:
    try:
        head.decode(codec)
        return True
    except Exception:
        return False


# BOM -> codec, longest BOM first (utf-32-le's BOM starts with
# utf-16-le's).  The cascade alone mis-reads big-endian UTF-16/32 (the
# NUL-heavy bytes "decode" under permissive 8-bit codecs) and keeps the
# ﻿ char under plain utf-8 — a web crawl hits all of these.
_BOMS = [
    # the endian-agnostic codecs consume the BOM during decode; the
    # explicit -le/-be ones would keep it as a character
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
    (codecs.BOM_UTF8, "utf-8-sig"),
]


def detect_codec(blob: bytes) -> str:
    """Return the first candidate codec that decodes the blob.

    Mirrors rag/nlp/__init__.py:53-71 (``find_codec``): head-first, then
    full blob, utf-8 fallback — with an explicit BOM check first.
    """
    if not blob:
        return "utf-8"
    head = bytes(blob[:1024])
    for bom, codec in _BOMS:
        if head.startswith(bom):
            return codec
    # BOM-less UTF-16: the reference's chardet pass detects it from the
    # NUL stripe (one byte of most code units is 0x00); the try-decode
    # cascade alone would mis-accept it under a permissive 8-bit codec.
    if len(head) >= 8 and 0 in head[:64]:
        window = head[: min(len(head) - (len(head) % 2), 64)]
        even_nuls = window[0::2].count(0)
        odd_nuls = window[1::2].count(0)
        half = len(window) // 2
        if even_nuls > half * 0.7 and odd_nuls < half * 0.3:
            return "utf-16-be"
        if odd_nuls > half * 0.7 and even_nuls < half * 0.3:
            return "utf-16-le"
    for codec in CANDIDATE_CODECS:
        if _try(codec, head):
            return codec
        try:
            bytes(blob).decode(codec)
            return codec
        except Exception:
            continue
    return "utf-8"


def decode_bytes(blob: bytes) -> str:
    """Decode with the detected codec, ignoring errors — the exact decode
    call the reference makes (deepdoc/parser/html_parser.py:33-34)."""
    if blob is None:
        return ""
    return bytes(blob).decode(detect_codec(blob), errors="ignore")
