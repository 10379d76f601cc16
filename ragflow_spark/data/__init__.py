from .pagegen import generate_pages, pages_dataframe, PAGE_SCHEMA  # noqa: F401
