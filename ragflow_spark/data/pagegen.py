"""Deterministic synthetic Common-Crawl-style page generator.

Implements FIXTURES.md §1: a ``pages(url, warc_ts, html, text, lang)``
table whose rows cycle through template classes (article, link farm,
long page, bulleted document, paper-like, edge cases, PDF) with
Zipf-skewed hosts and mixed encodings.  A single integer seed determines
every byte, so tests, the correctness gate, and the scaling bench all
see identical inputs.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_HOSTS = (
    ["hot.example.com"] * 8
    + ["warm.example.org"] * 4
    + ["news.example.net"] * 2
    + ["a.example.io", "b.example.io", "c.example.dev", "d.example.app"]
)

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog data spark engine cluster "
    "partition shuffle broadcast join filter scan column row batch arrow "
    "vector hash merge sort window stream table query plan stage task "
    "executor driver memory disk network latency throughput benchmark"
).split()

_ZH_CHARS = "数据处理引擎分区广播连接过滤扫描列行批向量哈希合并排序窗口流表查询计划阶段任务执行器内存磁盘网络延迟吞吐基准测试文档抽取分块标记"

_ENCODINGS = ["utf-8", "utf-8", "utf-8", "gb18030", "latin-1", "utf-16"]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_EN_WORDS) for _ in range(n)).capitalize() + "."


def _zh_sentence(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(_ZH_CHARS) for _ in range(n)) + "。"


def _paragraph(rng: random.Random, zh: bool, sentences: int) -> str:
    if zh:
        return "，".join(_zh_sentence(rng, rng.randint(8, 20)) for _ in range(sentences))
    return " ".join(_sentence(rng, rng.randint(8, 18)) for _ in range(sentences))


def _boilerplate(rng: random.Random) -> tuple[str, str]:
    nav = (
        "<nav><ul>"
        + "".join(f'<li><a href="/s{i}">Menu {i}</a></li>' for i in range(6))
        + "</ul></nav>"
    )
    side = (
        '<div class="sidebar"><h3>Sponsored</h3>'
        + "".join(
            f'<a href="/ad{i}">{_sentence(rng, 3)}</a>' for i in range(4)
        )
        + "</div>"
    )
    footer = (
        '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a>'
        "<p>© 2026 Example Media Holdings. All rights reserved.</p></footer>"
    )
    return nav + side, footer


def _article_page(rng: random.Random, i: int, zh: bool) -> tuple[str, str]:
    title = f"Article {i}: " + (" ".join(rng.choice(_EN_WORDS) for _ in range(4)))
    paras = [_paragraph(rng, zh, rng.randint(2, 4)) for _ in range(rng.randint(3, 6))]
    pre, post = _boilerplate(rng)
    html = (
        f"<html><head><title>{title}</title></head><body>{pre}<article>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + f"</article>{post}</body></html>"
    )
    return html, "\n".join(paras)


def _link_farm(rng: random.Random, i: int) -> tuple[str, str]:
    links = "".join(
        f'<li><a href="/p{j}">{_sentence(rng, 2)}</a></li>' for j in range(40)
    )
    return (
        f"<html><head><title>Directory {i}</title></head>"
        f"<body><ul>{links}</ul></body></html>",
        "",
    )


def _long_page(rng: random.Random, i: int, zh: bool) -> tuple[str, str]:
    title = f"Long read {i}"
    paras = [_paragraph(rng, zh, rng.randint(4, 8)) for _ in range(14)]
    pre, post = _boilerplate(rng)
    html = (
        f"<html><head><title>{title}</title></head><body>{pre}"
        f'<div class="content main">'
        + "".join(f"<p>{p}</p>" for p in paras)
        + f"</div>{post}</body></html>"
    )
    return html, "\n".join(paras)


def _bulleted_doc(rng: random.Random, i: int) -> tuple[str, str]:
    kind = i % 3
    lines = []
    if kind == 0:  # EN Chapter/Section grammar (BULLET_PATTERN group 4)
        for c in range(1, 4):
            lines.append(f"Chapter {'I' * c}")
            for s in range(1, 4):
                lines.append(f"Section {s}")
                lines.append(_paragraph(rng, False, 2))
    elif kind == 1:  # zh statute grammar (group 1)
        nums = "一二三四五"
        for c in range(3):
            lines.append(f"第{nums[c]}章 " + _zh_sentence(rng, 4))
            for s in range(2):
                lines.append(f"第{nums[s]}条 " + _zh_sentence(rng, 10))
    else:  # numeric grammar (group 2)
        for c in range(1, 4):
            lines.append(f"{c}. " + _sentence(rng, 5))
            for s in range(1, 3):
                lines.append(f"{c}.{s} " + _sentence(rng, 4))
                lines.append(_paragraph(rng, False, 2))
    body = "\n".join(lines)
    return body, body  # served as text/plain (txt route)


def _paper_like(rng: random.Random, i: int) -> tuple[str, str]:
    lines = [f"A Study of Synthetic Corpora {i}", "Abstract"]
    lines.append(_paragraph(rng, False, 3))
    for sec in range(1, 5):
        lines.append(f"{sec}. " + _sentence(rng, 3)[:-1])
        lines.append(_paragraph(rng, False, 4))
    body = "\n".join(lines)
    return body, body


def _edge_case(rng: random.Random, i: int) -> tuple[str, str]:
    """Edge + adversarial templates; each expected body is the exact
    main-content text (no title) — the synthetic-oracle the bench's
    exact-recovery rate is measured against."""
    farm_links = "".join(
        f'<li><a href="/x{j}">link {j}</a></li>' for j in range(30)
    )
    cases = [
        ("", ""),
        ("   \n\t  ", ""),
        ("<html><body><p>broken", "broken"),
        (
            "<html><head><title>Ｔａｂｌｅ</title></head><body><table><tr>"
            "<th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>"
            "</body></html>",
            "k v\na 1",
        ),
        ("mixed 中文 and english 句子 run", "mixed 中文 and english 句子 run"),
        # comments + script bodies must not leak into the text
        (
            "<html><head><title>Edge comments</title></head><body>"
            "<p>real text here</p><!-- secret comment -->"
            "<script>var x = 'fake text in script';</script></body></html>",
            "real text here",
        ),
        # CDATA inside script, plus a style block, between real paras
        (
            "<html><body><p>before</p><script><![CDATA[ hidden cdata ]]>"
            "</script><style>.x{color:red}</style><p>after</p></body></html>",
            "before\nafter",
        ),
        # nested tables: inner rows break out onto their own line
        (
            "<html><body><table><tr><td>outer a<table><tr><td>inner x</td>"
            "<td>inner y</td></tr></table></td><td>outer b</td></tr></table>"
            "</body></html>",
            "outer a\ninner x inner y\nouter b",
        ),
        # deeply-linked nav farm around a small real article: density
        # scoring must keep the article and drop the 30-link list
        (
            "<html><body><div><ul>" + farm_links + "</ul><article>"
            "<p>tiny real sentence that matters most here truly.</p>"
            "<p>second real paragraph with several more words to weigh.</p>"
            "</article></div></body></html>",
            "tiny real sentence that matters most here truly.\n"
            "second real paragraph with several more words to weigh.",
        ),
        # mis-nested inline tags recover without dropping text
        (
            "<html><body><p><b>bold <i>both</b> italic</i> plain</p></body></html>",
            "bold both italic plain",
        ),
        # entity decoding incl. numeric and nbsp
        (
            "<html><body><p>A &amp; B &lt;tag&gt; &#65;&nbsp;end</p></body></html>",
            "A & B <tag> A end",
        ),
        # <br> variants break lines
        (
            "<html><body><p>line one<br>line two<br/>line three</p></body></html>",
            "line one\nline two\nline three",
        ),
    ]
    return cases[i % len(cases)]


def _tiny_pdf(rng: random.Random, i: int) -> tuple[bytes, str]:
    paras = [_sentence(rng, rng.randint(6, 12)) for _ in range(4)]
    lines_ops = "\n".join(
        f"0 -{14 * (j + 1)} Td ({p.replace(chr(92), '').replace('(', '[').replace(')', ']')}) Tj"
        for j, p in enumerate(paras)
    )
    stream = f"BT /F1 12 Tf 72 720 Td {lines_ops} ET".encode("latin-1")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj",
        b"4 0 obj << /Length "
        + str(len(stream)).encode()
        + b" >> stream\n"
        + stream
        + b"\nendstream endobj",
    ]
    pdf = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    clean = [
        p.replace(chr(92), "").replace("(", "[").replace(")", "]") for p in paras
    ]
    return pdf, "\n".join(clean)


def generate_pages(n_rows: int, seed: int = 42) -> list[tuple]:
    """Rows of (url, warc_ts, html bytes, text, lang)."""
    rng = random.Random(seed)
    epoch = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n_rows):
        host = _HOSTS[rng.randrange(len(_HOSTS))]
        url = f"https://{host}/page-{i}"
        ts = epoch + dt.timedelta(seconds=37 * i)
        cls = i % 7
        lang = "Chinese" if i % 5 == 4 else "English"
        zh = lang == "Chinese"
        enc = _ENCODINGS[i % len(_ENCODINGS)]
        if cls == 0 or cls == 1:
            html, text = _article_page(rng, i, zh)
        elif cls == 2:
            html, text = _link_farm(rng, i)
        elif cls == 3:
            html, text = _long_page(rng, i, zh)
        elif cls == 4:
            html, text = _bulleted_doc(rng, i)
        elif cls == 5:
            html, text = _paper_like(rng, i)
        else:
            if i % 2 == 0:
                pdf, text = _tiny_pdf(rng, i)
                rows.append((url, ts, pdf, text, lang))
                continue
            html, text = _edge_case(rng, i)
        try:
            blob = html.encode(enc)
            # round-trip check: only keep non-utf8 encodings that decode
            # back identically through the codec cascade
            if enc != "utf-8":
                from ..text.codec import decode_bytes

                if decode_bytes(blob) != html:
                    blob = html.encode("utf-8")
        except (UnicodeEncodeError, LookupError):
            blob = html.encode("utf-8")
        rows.append((url, ts, blob, text, lang))
    return rows


def pages_dataframe(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    rows = generate_pages(n_rows, seed)
    df = spark.createDataFrame(rows, schema=PAGE_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def write_pages(
    spark: SparkSession, path: str, n_rows: int, seed: int = 42, partitions: int = 8
) -> None:
    pages_dataframe(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(
        path
    )
