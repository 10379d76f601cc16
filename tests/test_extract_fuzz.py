"""Robustness: extraction must never crash and must be deterministic on
arbitrary byte garbage — the property a 10^12-page crawl guarantees
you'll need."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ragflow_spark.chunk.templates import chunk_sections
from ragflow_spark.spark.udfs import extract_document
from ragflow_spark.text.codec import decode_bytes
from ragflow_spark.text.tokenizer import content_tokens

_settings = settings(
    max_examples=200, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_settings
@given(blob=st.binary(max_size=4096), text=st.text(max_size=200))
def test_extract_document_total(blob, text):
    a = extract_document(blob, text, "English")
    b = extract_document(blob, text, "English")
    assert a == b  # deterministic
    doc_type, title, body, sections = a
    assert isinstance(doc_type, str) and isinstance(sections, list)


@_settings
@given(blob=st.binary(max_size=2048))
def test_decode_bytes_total(blob):
    out = decode_bytes(blob)
    assert isinstance(out, str)
    assert decode_bytes(blob) == out


@_settings
@given(
    html=st.text(
        alphabet=st.sampled_from(list("<>/ab cdiv=\"'&#;自动化数据!?\n\t")), max_size=2000
    )
)
def test_extract_html_never_crashes(html):
    from ragflow_spark.extract.html import extract_html

    res = extract_html(html.encode("utf-8"))
    assert isinstance(res.text, str)
    assert all(isinstance(s, str) for s in res.sections)


@_settings
@given(
    sections=st.lists(st.text(max_size=120), max_size=12),
    template=st.sampled_from(["naive", "book", "laws", "paper", "one", "presentation"]),
)
def test_chunk_templates_total(sections, template):
    out = chunk_sections(template, sections)
    assert isinstance(out, list)
    assert all(isinstance(c, str) for c in out)
    assert chunk_sections(template, sections) == out


@_settings
@given(text=st.text(max_size=400))
def test_tokenizer_total(text):
    ltks, sm = content_tokens(text)
    assert isinstance(ltks, str) and isinstance(sm, str)
