"""Script-aware tokenization: the engine's ``content_ltks`` /
``content_sm_ltks`` producer.

Behavior matched to ``RagTokenizer`` (rag/nlp/rag_tokenizer.py:322-432):

1. normalize: non-word runs -> space, full->half width, lower,
   traditional->simplified (:323-325; compact t2s table in
   normalize.py — hanziconv's full table is unavailable in-sandbox,
   rarer characters pass through unchanged, documented deviation);
2. split the line into script runs (CJK vs not, :299-320);
3. Latin runs: whitespace tokens -> lemmatize -> Porter stem (:331);
4. CJK runs: dictionary bidirectional max-match.  The huqie dictionary
   (InfiniFlow/huqie, fetched at deploy time by download_deps.py:44-49)
   cannot be downloaded here, so the default dictionary is empty and CJK
   segments fall back to the same single-char tokens the reference's DFS
   yields for out-of-vocabulary runs; a user dictionary can be supplied
   via ``load_user_dict`` to enable real max-match.
5. ``fine_grained_tokenize`` (:394-432): for mostly-non-CJK token lists,
   split tokens on "/" and re-normalize — the path our web corpus hits.
"""

from __future__ import annotations

import re

from .normalize import full_to_half, tradi2simp
from functools import lru_cache

from .porter import lemmatize_noun, porter_stem


@lru_cache(maxsize=1 << 17)
def _stem(token: str) -> str:
    """Memoized lemmatize+stem: real corpora are Zipfian, so the hot
    vocabulary fits the cache and the stemmer runs once per type, not
    once per occurrence (~10x on the tokenize hot path)."""
    return porter_stem(lemmatize_noun(token))


_NON_WORD = re.compile(r"\W+")
_ALPHA_TOKEN = re.compile(r"[a-zA-Z_-]+$")
_NUMERIC_TOKEN = re.compile(r"[0-9,\.-]+$")
_LATIN_RUN = re.compile(r"[a-z\.-]+$")
_DIGIT_RUN = re.compile(r"[0-9\.-]+$")


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "龥"


_CJK_OR_NOT = re.compile(r"[一-龥]+|[^一-龥]+")
_ASCII_TOKEN = re.compile(r"[a-z0-9]+|_+")


def _ascii_tokenize(line: str) -> str:
    """Stemmed tokens of an ASCII line: alnum runs + '_' runs, in
    order (exactly the SPLIT_CHAR piece structure after \\W+ -> space;
    underscore is a separator the reference keeps as a token)."""
    return " ".join(_stem(t) for t in _ASCII_TOKEN.findall(line.lower()))


def _script_runs(line: str) -> list[tuple[str, bool]]:
    runs: list[tuple[str, bool]] = []
    for piece in re.split(r"([ ,\.<>/?;:'\[\]\\`!@#$%^&*\(\)\{\}\|_+=《》，。？、；‘’：“”【】~！￥%……（）——-]+|[a-zA-Z0-9,\.-]+)", line):
        if not piece:
            continue
        if piece.isascii():  # fast path: pure-latin piece, one run
            runs.append((piece, False))
            continue
        for m in _CJK_OR_NOT.finditer(piece):
            run = m.group()
            runs.append((run, _is_cjk(run[0])))
    return runs


class WebTokenizer:
    def __init__(self, dictionary: dict[str, int] | None = None):
        # word -> frequency; empty by default (see module docstring)
        self.dict = dictionary or {}
        self.max_word = max((len(w) for w in self.dict), default=1)

    def load_user_dict(self, path: str) -> None:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.split()
                if parts:
                    self.dict[parts[0]] = (
                        int(parts[1]) if len(parts) > 1 else 1
                    )
        self.max_word = max((len(w) for w in self.dict), default=1)

    # -- CJK segmentation ---------------------------------------------
    def _max_forward(self, run: str) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(run):
            hit = None
            for ln in range(min(self.max_word, len(run) - i), 1, -1):
                if run[i : i + ln] in self.dict:
                    hit = run[i : i + ln]
                    break
            if hit is None:
                hit = run[i]
            out.append(hit)
            i += len(hit)
        return out

    def _max_backward(self, run: str) -> list[str]:
        out: list[str] = []
        j = len(run)
        while j > 0:
            hit = None
            for ln in range(min(self.max_word, j), 1, -1):
                if run[j - ln : j] in self.dict:
                    hit = run[j - ln : j]
                    break
            if hit is None:
                hit = run[j - 1]
            out.append(hit)
            j -= len(hit)
        return out[::-1]

    def _segment_cjk(self, run: str) -> list[str]:
        if len(run) < 2 or _LATIN_RUN.match(run) or _DIGIT_RUN.match(run):
            return [run]
        if not self.dict:
            # no dictionary: forward and backward max-match both yield
            # per-char tokens (the reference's OOV behavior)
            return list(run)
        fwd = self._max_forward(run)
        bwd = self._max_backward(run)
        if fwd == bwd:
            return fwd
        # disagreement: prefer the segmentation with fewer tokens, then
        # higher total frequency (stand-in for the reference's DFS rescore,
        # rag/nlp/rag_tokenizer.py:119-198)
        def score(tks: list[str]) -> tuple[int, int]:
            return (-len(tks), sum(self.dict.get(t, 0) for t in tks))

        return max((fwd, bwd), key=score)

    # -- public API -----------------------------------------------------
    def tokenize(self, line: str) -> str:
        # exact fast path for the dominant web case: Q2B and trad->simp
        # are identity on ASCII, and \W+ -> space only separates what
        # the alnum-run findall separates anyway, so the SPLIT_CHAR
        # piece structure reduces to alnum runs and "_" runs
        # (underscore is a separator the reference keeps as a token)
        if line.isascii():
            return _ascii_tokenize(line)
        # normalize order parity (rag_tokenizer.py:322-325): strip
        # non-word runs, Q2B, lowercase, traditional->simplified
        line = _NON_WORD.sub(" ", line)
        if line.isascii():  # the non-ASCII chars were all \W
            return _ascii_tokenize(line)
        line = tradi2simp(full_to_half(line).lower())
        tokens: list[str] = []
        for run, cjk in _script_runs(line):
            if not run.strip():
                continue
            if not cjk:
                tokens.extend(
                    _stem(t) for t in run.split()
                )
            else:
                tokens.extend(self._segment_cjk(run))
        return " ".join(tokens)

    def fine_grained_tokenize(self, tks: str) -> str:
        if tks and tks.isascii() and "/" not in tks:
            # exact fast path: zero CJK tokens -> the "/"-split branch,
            # which only re-normalizes spacing when no "/" is present
            return " ".join(tks.split())
        tokens = tks.split()
        cjk_count = sum(1 for t in tokens if t and _is_cjk(t[0]))
        if cjk_count < len(tokens) * 0.2:
            out: list[str] = []
            for t in tokens:
                out.extend(t.split("/"))
            return " ".join(out)
        out = []
        for t in tokens:
            if len(t) < 3 or _NUMERIC_TOKEN.match(t):
                out.append(t)
                continue
            if all(_is_cjk(c) for c in t) and len(t) > 2:
                # re-split multi-char CJK words into chars (second-best
                # segmentation analogue)
                out.append(" ".join(t))
            else:
                out.append(t)
        return " ".join(
            _stem(t) if _ALPHA_TOKEN.match(t) else t
            for t in " ".join(out).split()
        )


_DEFAULT = WebTokenizer()


def tokenize_text(line: str) -> str:
    return _DEFAULT.tokenize(line)


def fine_grained(tks: str) -> str:
    return _DEFAULT.fine_grained_tokenize(tks)


_TABLE_TAG = re.compile(r"</?(table|td|caption|tr|th)( [^<>]{0,12})?>")


def content_tokens(chunk_text: str) -> tuple[str, str]:
    """(content_ltks, content_sm_ltks) for one chunk — mirrors
    ``tokenize`` (rag/nlp/__init__.py:260-264) incl. table-tag strip."""
    plain = _TABLE_TAG.sub(" ", chunk_text) if "<" in chunk_text else chunk_text
    ltks = tokenize_text(plain)
    return ltks, fine_grained(ltks)
