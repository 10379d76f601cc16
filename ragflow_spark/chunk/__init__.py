from .delimiters import delimiter_pattern  # noqa: F401
from .merge import greedy_merge, strip_position_tags  # noqa: F401
from .hierarchy import (  # noqa: F401
    BULLET_GROUPS,
    bullet_group_of,
    outline_merge,
    heading_pivot_levels,
)
