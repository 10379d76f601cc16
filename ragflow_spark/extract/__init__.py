from .html import extract_html, HtmlExtraction  # noqa: F401
