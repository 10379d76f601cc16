"""Table + QA template tests (pure-python layers)."""

from __future__ import annotations

from ragflow_spark.chunk.qa import (
    index_int,
    qa_chunk,
    qa_from_delimited,
    qa_from_markdown,
    qa_from_sections,
    qbullets_category,
    rm_prefix,
)
from ragflow_spark.chunk.table_template import (
    field_name,
    infer_column_type,
    parse_delimited,
    table_chunks,
    table_rows,
    trans_bool,
    trans_datetime,
)

# -- table ------------------------------------------------------------------


def test_infer_column_type_majority_int():
    vals, ty = infer_column_type(["1", "2", "30", "x"])
    assert ty == "int"
    assert vals == [1, 2, 30, None]


def test_infer_column_type_leading_zero_is_text():
    # reference quirk: leading '0' disqualifies numerics (ids/zip codes)
    _, ty = infer_column_type(["0123", "0456", "0789"])
    assert ty == "text"


def test_infer_column_type_float_bool_datetime():
    assert infer_column_type(["1.5", "2.25", "3.0"])[1] == "float"
    assert infer_column_type(["yes", "no", "YES"])[1] == "bool"
    assert infer_column_type(["2023-04-05", "2021/1/2".replace("/", "-")])[1] == "datetime"


def test_trans_helpers():
    assert trans_bool("✓") == "yes"
    assert trans_bool("×") == "no"
    assert trans_bool("maybe") is None
    assert trans_datetime("2023-04-05") == "2023-04-05 00:00:00"
    assert trans_datetime("not a date") is None


def test_parse_delimited_drops_bad_arity():
    headers, rows = parse_delimited("a\tb\n1\t2\nbroken\n3\t4")
    assert headers == ["a", "b"]
    assert rows == [["1", "2"], ["3", "4"]]


def test_table_rows_and_field_map():
    texts, fmap, dicts = table_rows(["name", "count"], [["apple", "1"], ["pear", "2"]])
    assert texts == ["name:apple; count:1", "name:pear; count:2"]
    assert fmap == {"name_tks": "name", "count_long": "count"}
    assert dicts[0]["count_long"] == 1


def test_table_chunks_batching():
    rows = [[f"r{i}", str(i)] for i in range(25)]
    chunks = table_chunks(["name", "n"], rows, batch_size=10)
    assert len(chunks) == 3
    assert chunks[0].count("name:") == 10


def test_field_name_slug():
    assert field_name("gender/sex(male, female)", "text") == "gender_tks"
    assert field_name("supplier vendor", "int") == "supplier_vendor_long"


def test_infer_column_type_percent_cells_survive():
    # '15%%' passes the int test via the '%%'-stripped copy; the range
    # check must run on that copy too (int('15%%') raised and aborted
    # the whole table — the reference crashes here, rag/app/table.py's
    # int(str(a)); a poisoned cell must not kill the job)
    vals, ty = infer_column_type(["15%%", "30%%", "45%%"])
    assert ty == "int"
    # the converter still sees the raw cell -> unconvertible -> null
    assert vals == [None, None, None]


def test_infer_column_type_percent_bigint_forces_float():
    _, ty = infer_column_type([f"{2**64}%%", "1"])
    assert ty == "float"


def test_table_rows_duplicate_field_slugs():
    # 'Total' and 'total ' slug to the SAME typed field name; the old
    # positional list(field_map.keys())[j] indexing IndexError'd (dict
    # collapsed two headers into one key). Field names stay a parallel
    # list like the reference's clmns (rag/app/table.py:289-293).
    texts, fmap, dicts = table_rows(["Total", "total "], [["1", "2"]])
    assert texts == ["Total:1; total :2"]
    assert list(fmap) == ["total_long"]
    # within a row the duplicate key keeps the LAST column's value,
    # matching the reference's dict-assignment order
    assert dicts == [{"total_long": 2}]


# -- qa ---------------------------------------------------------------------


def test_index_int_formats():
    assert index_int("7") == 7
    assert index_int("three") == 3
    assert index_int("IX") == 9
    assert index_int("十二") == 12
    assert index_int("junk") == -1


def test_qbullets_category_picks_dominant():
    secs = ["1. What is Spark?", "2. Why partition?", "3. How to shuffle?"]
    idx, pat = qbullets_category(secs)
    assert pat is not None and pat.match("1. ")


def test_rm_prefix_and_chunk_format():
    assert rm_prefix("Question: What?") == "What?"
    assert rm_prefix("答：因为") == "因为"
    assert qa_chunk("Q: a?", "A: b", eng=True) == "Question: a?\tAnswer: b"


def test_qa_from_delimited_state_machine():
    txt = "q1\ta1\ncontinuation of a1\nq2\ta2"
    out = qa_from_delimited(txt)
    assert out == [
        "Question: q1\tAnswer: a1\ncontinuation of a1",
        "Question: q2\tAnswer: a2",
    ]


def test_qa_from_markdown_heading_stack():
    md = "# Topic\n## What is X?\nX is a thing.\n## Why X?\nBecause.\n"
    out = qa_from_markdown(md)
    assert len(out) == 2
    assert out[0].startswith("Question: Topic\nWhat is X?\t")
    # answers render to HTML (rag/app/qa.py:438 markdown(...))
    assert out[0].endswith("Answer: <p>X is a thing.</p>")
    out_raw = qa_from_markdown(md, render=False)
    assert out_raw[0].endswith("Answer: X is a thing.")


def test_qa_from_markdown_code_block_ignored():
    # the ``` fence shields the inner line from QUESTION detection in
    # the heading-stack walk; the renderer (like Python-Markdown
    # without the fenced_code extension) still renders the inner line
    # per plain markdown rules
    md = "## Q?\n```\n# not a heading\n```\nanswer\n"
    out = qa_from_markdown(md)
    assert len(out) == 1 and "not a heading" in out[0]
    out_raw = qa_from_markdown(md, render=False)
    assert len(out_raw) == 1 and "# not a heading" in out_raw[0]


def test_qa_from_sections():
    # note: a leading "answer "/"Q: " style prefix is stripped by
    # rm_prefix (reference parity), so body text avoids those words
    secs = ["1. First question?", "the first reply", "2. Second question?", "the second reply"]
    out = qa_from_sections(secs)
    assert len(out) == 2
    assert out[1] == "Question: 2. Second question?\tAnswer: the second reply"
