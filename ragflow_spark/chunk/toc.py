"""Table-of-contents removal and colon-title synthesis.

Behavior matched to ``remove_contents_table`` (rag/nlp/__init__.py:347-376)
and ``make_colon_as_title`` (:379-398).  Operates in place on a section
list of either plain strings or (text, layout) pairs, like the reference.
"""

from __future__ import annotations

import re

# case-SENSITIVE on purpose: the reference puts IGNORECASE on the
# whitespace-sub call, not the match (rag/nlp/__init__.py:355-356), so
# "Contents" is not a TOC heading there — quirk preserved for parity.
# "table of contents" (spaces intact) is likewise verbatim from the
# reference: since the match runs AFTER spaces are stripped, that
# alternative can never fire there either — dead branch preserved so a
# "Table of Contents" heading survives on both sides.
_TOC_HEAD = re.compile(r"(contents|目录|目次|table of contents|致谢|acknowledge)$")
_SPACES = re.compile(r"(\xa0|　| )+")


def _sec_text(sections, i) -> str:
    s = sections[i]
    return (s if isinstance(s, str) else s[0]).strip()


def drop_toc_sections(sections: list, eng: bool = False) -> None:
    i = 0
    while i < len(sections):
        head = _SPACES.sub("", _sec_text(sections, i).split("@@")[0])
        if not _TOC_HEAD.match(head):
            i += 1
            continue
        sections.pop(i)
        if i >= len(sections):
            break
        prefix = (
            _sec_text(sections, i)[:3]
            if not eng
            else " ".join(_sec_text(sections, i).split()[:2])
        )
        while not prefix:
            sections.pop(i)
            if i >= len(sections):
                break
            prefix = (
                _sec_text(sections, i)[:3]
                if not eng
                else " ".join(_sec_text(sections, i).split()[:2])
            )
        if i >= len(sections):
            # the blank-skip loop exhausted the list: the unconditional
            # pop below raised IndexError on a TOC heading followed
            # only by whitespace sections (reference shares the
            # structure; a crash here kills the whole laws/book chunk)
            break
        sections.pop(i)
        if i >= len(sections) or not prefix:
            break
        for j in range(i, min(i + 128, len(sections))):
            # escape: prefix is raw document text — 'Section (' is an
            # unbalanced-paren re.error, and '1.5' silently matched
            # '125'-prefixed sections (deleting the wrong range); the
            # reference crashes on the same inputs, a literal-prefix
            # match is what the code means
            if not re.match(re.escape(prefix), _sec_text(sections, j)):
                continue
            for _ in range(i, j):
                sections.pop(i)
            break


def synthesize_colon_titles(sections: list) -> list:
    """Insert a synthetic "title" section before long 'Heading: body'
    sections (make_colon_as_title)."""
    if not sections:
        return []
    if isinstance(sections[0], str):
        return sections
    i = 0
    while i < len(sections):
        txt, _layout = sections[i]
        i += 1
        txt = txt.split("@")[0].strip()
        if not txt or txt[-1] not in ":：":
            continue
        reversed_txt = txt[::-1]
        parts = re.split(r"([。？！!?;；]| \.)", reversed_txt)
        # parts[1] is the captured 1-2 char separator, so this guard can
        # never pass — a latent no-op in the reference (rag/nlp/__init__.py
        # :393) replicated as-is for output parity.
        if len(parts) < 2 or len(parts[1]) < 32:
            continue
        sections.insert(i - 1, (parts[0][::-1], "title"))
        i += 1
    return sections
