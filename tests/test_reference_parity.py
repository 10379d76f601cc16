"""Byte-identity parity vs the REFERENCE'S OWN code.

The reference's chunking core (rag/nlp/__init__.py) is pure Python; its
module-level imports (datrie/PIL/chardet/...) are unavailable here, so
the needed functions are extracted from the source AST and executed
with their true dependencies stubbed by OUR implementations of the
same contracts (token counter, tag stripper).  Both sides then consume
the identical token counter, so any output difference is a genuine
logic divergence — this is the strongest in-sandbox evidence for the
north rule's byte-identical requirement on the chunker layer.

No reference code is copied into the repo: functions are loaded at
test time from /root/reference and compared black-box.
"""

from __future__ import annotations

import ast
import random
import sys
import types

import pytest

from ragflow_spark.chunk.delimiters import delimiter_pattern
from ragflow_spark.chunk.hierarchy import bullet_group_of, outline_merge
from ragflow_spark.chunk.merge import greedy_merge, strip_position_tags
from ragflow_spark.text.tokens import count_tokens

REF = "/root/reference/rag/nlp/__init__.py"

_NAMES = [
    "BULLET_PATTERN",
    "random_choices",
    "not_bullet",
    "bullets_category",
    "not_title",
    "hierarchical_merge",
    "get_delimiters",
    "naive_merge",
    "remove_contents_table",
    "make_colon_as_title",
    "title_frequency",
    "QUESTION_PATTERN",
    "qbullets_category",
]


@pytest.fixture(scope="module")
def ref():
    tree = ast.parse(open(REF).read())
    wanted = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _NAMES:
            wanted.append(node)
        elif isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id in _NAMES for t in node.targets
        ):
            wanted.append(node)
    mod = ast.Module(body=wanted, type_ignores=[])
    import copy as _copy
    import logging as _logging
    import re as _re
    from collections import Counter as _Counter

    # stub: the in-function `from deepdoc.parser.pdf_parser import
    # RAGFlowPdfParser` (naive_merge overlap path)
    fake_pdf = types.ModuleType("deepdoc.parser.pdf_parser")
    fake_pdf.RAGFlowPdfParser = type(
        "RAGFlowPdfParser", (), {"remove_tag": staticmethod(strip_position_tags)}
    )
    fake_pkg = types.ModuleType("deepdoc")
    fake_parser = types.ModuleType("deepdoc.parser")
    sys.modules.setdefault("deepdoc", fake_pkg)
    sys.modules.setdefault("deepdoc.parser", fake_parser)
    sys.modules["deepdoc.parser.pdf_parser"] = fake_pdf

    ns = {
        "re": _re,
        "copy": _copy,
        "logging": _logging,
        "random": random,
        "Counter": _Counter,
        # both sides share OUR token counter: differences isolate the
        # merge/outline logic itself
        "num_tokens_from_string": count_tokens,
    }
    exec(compile(mod, REF, "exec"), ns)
    return ns


# -- fixtures of section material ------------------------------------------

EN_SECTIONS = [
    "Spark builds a logical plan first. The optimizer rewrites it!",
    "Partitions shuffle on keys; skewed keys hurt. Broadcast small sides.",
    "Filters push to the scan. Column pruning is free! Codegen fuses stages.",
    "A short one.",
    "Adaptive execution re-plans at runtime? Yes. It coalesces partitions.",
] * 3

ZH_SECTIONS = [
    "数据处理引擎按列扫描。过滤条件下推到存储！分区按键重排。",
    "广播小表避免大洗牌。倾斜键需要加盐；自适应执行在运行时再计划。",
    "短句。",
] * 4

TAGGED_SECTIONS = [
    ("First tagged block with several words inside it", "@@1\t10.0\t90.0\t5.0\t15.0##"),
    ("Second block, also tagged and somewhat longer than before", "@@1\t10.0\t90.0\t20.0\t30.0##"),
    ("Third.", "@@2\t10.0\t90.0\t5.0\t15.0##"),
] * 5

LAW_SECTIONS = [
    "第一章 总则",
    "第一条 为了规范数据处理活动 保障数据安全 制定本法",
    "第二条 在境内开展数据处理活动 适用本法",
    "第二章 数据安全",
    "第三条 国家建立数据分类分级保护制度",
    "（一）重要数据目录管理",
    "（二）核心数据实行严格保护",
    "第三章 附则",
    "第四条 本法自公布之日起施行",
]

EN_OUTLINE = [
    "Chapter I Introduction",
    "Section 1 Background of the engine",
    "Section 2 Goals and non goals",
    "Chapter II Design",
    "Section 3 The planner",
    "Article 4 Determinism requirements",
    "Chapter III Evaluation",
]


# -- get_delimiters --------------------------------------------------------


@pytest.mark.parametrize(
    "delims",
    ["\n!?。；！？", "\n。；！？", ".,!?", "`##`|\n", "`abc`\n。", ""],
)
def test_get_delimiters_parity(ref, delims):
    assert delimiter_pattern(delims) == ref["get_delimiters"](delims)


# -- naive_merge -----------------------------------------------------------


@pytest.mark.parametrize(
    "sections,budget,delims,overlap",
    [
        (EN_SECTIONS, 16, "\n!?。；！？", 0),
        (EN_SECTIONS, 64, "\n!?。；！？", 0),
        (EN_SECTIONS, 128, "\n!?。；！？", 0),
        (EN_SECTIONS, 32, "\n!?。；！？", 20),
        (ZH_SECTIONS, 16, "\n!?。；！？", 0),
        (ZH_SECTIONS, 48, "\n。；！？", 30),
        ([" ".join(EN_SECTIONS)], 24, "\n!?。；！？", 0),  # forces splitting
        ([], 64, "\n!?。；！？", 0),
        ([""], 64, "\n!?。；！？", 0),
    ],
)
def test_naive_merge_parity(ref, sections, budget, delims, overlap):
    theirs = ref["naive_merge"](
        list(sections), chunk_token_num=budget, delimiter=delims,
        overlapped_percent=overlap,
    )
    ours = greedy_merge(list(sections), budget, delims, overlap)
    assert ours == theirs


def test_naive_merge_parity_tagged(ref):
    theirs = ref["naive_merge"](list(TAGGED_SECTIONS), 16, "\n!?。；！？", 0)
    ours = greedy_merge(list(TAGGED_SECTIONS), 16, "\n!?。；！？", 0)
    assert ours == theirs


# -- bullets_category ------------------------------------------------------


@pytest.mark.parametrize(
    "sections",
    [LAW_SECTIONS, EN_OUTLINE, EN_SECTIONS, ["1. one", "2. two", "3.1 three x"]],
)
def test_bullets_category_parity(ref, sections):
    assert bullet_group_of(list(sections)) == ref["bullets_category"](list(sections))


# -- hierarchical_merge ----------------------------------------------------


@pytest.mark.parametrize("sections", [LAW_SECTIONS, EN_OUTLINE])
@pytest.mark.parametrize("depth", [3, 5])
def test_hierarchical_merge_parity(ref, sections, depth):
    bull = ref["bullets_category"](list(sections))
    theirs = ref["hierarchical_merge"](bull, list(sections), depth)
    ours = outline_merge(bull, list(sections), depth=depth)
    assert ours == theirs


# -- RAGFlowTxtParser.parser_txt -------------------------------------------


@pytest.fixture(scope="module")
def ref_txt():
    tree = ast.parse(open("/root/reference/deepdoc/parser/txt_parser.py").read())
    cls = next(
        n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "RAGFlowTxtParser"
    )
    import re as _re

    ns = {"re": _re, "num_tokens_from_string": count_tokens, "get_text": None}
    exec(compile(ast.Module(body=[cls], type_ignores=[]), "txt_parser", "exec"), ns)
    return ns["RAGFlowTxtParser"]


@pytest.mark.parametrize(
    "txt,budget,delims",
    [
        ("one. two! three? " * 40, 32, "\n!?;。；！？"),
        ("line\nline two\nline three! " * 20, 16, "\n!?;。；！？"),
        ("a`SEP`b`SEP`c " * 30, 8, "`SEP`\n"),
        ("", 128, "\n!?;。；！？"),
        ("短句。另一句！第三句？" * 25, 16, "\n!?;。；！？"),
    ],
)
def test_txt_parser_parity(ref_txt, txt, budget, delims):
    from ragflow_spark.parsers.txt import split_txt

    ours = [tuple(p) for p in split_txt(txt, budget, delims)]
    theirs = [tuple(p) for p in ref_txt.parser_txt(txt, budget, delims)]
    assert ours == theirs


# -- RAGFlowMarkdownParser.extract_tables_and_remainder --------------------


@pytest.fixture(scope="module")
def ref_md():
    tree = ast.parse(open("/root/reference/deepdoc/parser/markdown_parser.py").read())
    cls = next(
        n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "RAGFlowMarkdownParser"
    )
    import re as _re

    ns = {"re": _re, "num_tokens_from_string": count_tokens}
    exec(compile(ast.Module(body=[cls], type_ignores=[]), "markdown_parser", "exec"), ns)
    return ns["RAGFlowMarkdownParser"](chunk_token_num=128)


MD_DOC = """# Title

Intro paragraph here.

| a | b |
|---|---|
| 1 | 2 |
| 3 | 4 |

Closing words.

<table><tr><td>html cell</td></tr></table>

tail text
"""


def test_markdown_table_extraction_parity(ref_md):
    from ragflow_spark.parsers.markdown import split_markdown_tables

    theirs_rem, theirs_tables = ref_md.extract_tables_and_remainder(MD_DOC)
    ours_rem, ours_tables = split_markdown_tables(MD_DOC)
    assert ours_tables == theirs_tables
    assert ours_rem == theirs_rem




# -- property-based fuzz parity (hypothesis) -------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ALPHABET = "ab cd. ef! gh? 。；！？\n一二三数据 123\t@#"

# table-shaped alphabet: pipes, dashes, colons, whitespace (incl. the
# newline-crossing \s* quirk the reference's divider rows carry), text
_MD_TABLE_ALPHABET = "|-: \t\nab"


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(txt=st.text(alphabet=_MD_TABLE_ALPHABET, max_size=80))
def test_markdown_table_extraction_parity_fuzz(ref_md, txt):
    """Pin the linear-regex rewrite to the reference patterns over
    adversarial table-ish strings: same tables, same remainder.  The
    r5 rewrite's one-directional fuzz missed two newline-crossing
    divider shapes (blank line before a borderless divider; a bordered
    divider borrowing the next row's leading pipe) — this compares
    both directions via full output equality."""
    from ragflow_spark.parsers.markdown import split_markdown_tables

    doc = txt + "\n"
    theirs_rem, theirs_tables = ref_md.extract_tables_and_remainder(doc)
    ours_rem, ours_tables = split_markdown_tables(doc)
    assert ours_tables == theirs_tables
    assert ours_rem == theirs_rem


@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sections=st.lists(st.text(alphabet=_ALPHABET, max_size=120), max_size=15),
    budget=st.sampled_from([4, 16, 64, 256]),
    overlap=st.sampled_from([0, 20, 50]),
)
def test_naive_merge_parity_fuzz(ref, sections, budget, overlap):
    theirs = ref["naive_merge"](
        list(sections), chunk_token_num=budget,
        delimiter="\n!?。；！？", overlapped_percent=overlap,
    )
    assert greedy_merge(list(sections), budget, "\n!?。；！？", overlap) == theirs


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(txt=st.text(alphabet=_ALPHABET, max_size=600), budget=st.sampled_from([8, 64]))
def test_txt_parser_parity_fuzz(ref_txt, txt, budget):
    from ragflow_spark.parsers.txt import split_txt

    ours = [tuple(p) for p in split_txt(txt, budget, "\n!?;。；！？")]
    theirs = [tuple(p) for p in ref_txt.parser_txt(txt, budget, "\n!?;。；！？")]
    assert ours == theirs


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sections=st.lists(
        st.one_of(
            st.text(alphabet=_ALPHABET, max_size=60),
            st.sampled_from(LAW_SECTIONS + EN_OUTLINE),
        ),
        max_size=20,
    )
)
def test_bullets_category_parity_fuzz(ref, sections):
    assert bullet_group_of(list(sections)) == ref["bullets_category"](list(sections))


# -- remove_contents_table / make_colon_as_title / title_frequency ---------

TOC_SECTIONS_LOWER = [
    "contents",
    "chapter alpha .... 3",
    "chapter beta .... 9",
    "chapter alpha",
    "body text here",
]


@pytest.mark.parametrize("eng", [True, False])
@pytest.mark.parametrize(
    "sections",
    [TOC_SECTIONS_LOWER, ["Contents", "x 1", "x 2"], EN_SECTIONS, LAW_SECTIONS],
)
def test_remove_contents_table_parity(ref, sections, eng):
    from ragflow_spark.chunk.toc import drop_toc_sections

    theirs = list(sections)
    ref["remove_contents_table"](theirs, eng)
    ours = list(sections)
    drop_toc_sections(ours, eng)
    assert ours == theirs


@pytest.mark.parametrize(
    "pairs",
    [
        [("Heading here:", "text"), ("body " * 40, "text")],
        [("short:", "text")],
        [("句子结尾：", "text"), ("很长的内容" * 20, "text")],
        [("no colon at all", "text")],
    ],
)
def test_make_colon_as_title_parity(ref, pairs):
    from ragflow_spark.chunk.toc import synthesize_colon_titles

    theirs = [tuple(p) for p in pairs]
    theirs_l = [list(p) for p in theirs]
    ref["make_colon_as_title"](theirs_l)
    ours = [tuple(p) for p in pairs]
    synthesize_colon_titles(ours)
    assert [tuple(p) for p in ours] == [tuple(p) for p in theirs_l]


@pytest.mark.parametrize(
    "sections",
    [
        [(s, "") for s in EN_OUTLINE],
        [(s, "title" if i % 3 == 0 else "text") for i, s in enumerate(EN_OUTLINE)],
        [(s, "") for s in LAW_SECTIONS],
        [("plain body only", "text"), ("another", "text")],
    ],
)
def test_title_frequency_parity(ref, sections):
    from ragflow_spark.chunk.hierarchy import heading_pivot_levels

    bull = ref["bullets_category"]([t for t, _ in sections])
    theirs = ref["title_frequency"](bull, [tuple(p) for p in sections])
    ours = heading_pivot_levels(bull, [tuple(p) for p in sections])
    assert ours == theirs


# -- RAGFlowJsonParser ------------------------------------------------------


@pytest.fixture(scope="module")
def ref_json():
    tree = ast.parse(open("/root/reference/deepdoc/parser/json_parser.py").read())
    cls = next(
        n
        for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "RAGFlowJsonParser"
    )
    import json as _json

    ns = {"json": _json, "Any": object, "find_codec": lambda b: "utf-8"}
    exec(compile(ast.Module(body=[cls], type_ignores=[]), "json_parser", "exec"), ns)
    return ns["RAGFlowJsonParser"]


_JSON_DOCS = [
    '{"a": 1, "b": {"c": [1, 2, 3], "d": "text"}}',
    '{"big": "' + "x" * 5000 + '", "small": 1}',
    "[" + ",".join('{"k%d": %d}' % (i, i) for i in range(50)) + "]",
    '{"nested": {"deep": {"deeper": {"value": "' + "y" * 3000 + '"}}}}',
    "not json at all",
    "",
    # JSONL
    "\n".join('{"row": %d, "text": "line %d"}' % (i, i) for i in range(20)),
]


@pytest.mark.parametrize("doc", _JSON_DOCS)
@pytest.mark.parametrize("max_size", [200, 2000])
def test_json_parser_parity(ref_json, doc, max_size):
    from ragflow_spark.parsers.jsonp import split_json_text

    theirs = ref_json(max_chunk_size=max_size)(doc.encode("utf-8"))
    ours = split_json_text(doc.encode("utf-8"), max_chunk_size=max_size)
    assert ours == theirs


# -- qbullets_category ------------------------------------------------------


@pytest.mark.parametrize(
    "sections",
    [
        ["1. What is this?", "an answer", "2. And that?", "more"],
        ["第一问 什么是引擎", "回答", "第二问 为什么"],
        ["QUESTION ONE", "answer", "QUESTION TWO", "answer"],
        ["（一）问题", "（二）另一个"],
        ["no bullets here", "plain text"],
    ],
)
def test_qbullets_category_parity(ref, sections):
    from ragflow_spark.chunk.qa import qbullets_category

    their_idx, their_pat = ref["qbullets_category"](list(sections))
    our_idx, our_pat = qbullets_category(list(sections))
    assert our_idx == their_idx
    if our_idx >= 0:
        assert our_pat.pattern == their_pat
