from .txt import split_txt  # noqa: F401
from .markdown import split_markdown_tables, markdown_sections  # noqa: F401
from .jsonp import split_json_text  # noqa: F401
