from .codec import detect_codec, decode_bytes  # noqa: F401
from .tokens import count_tokens  # noqa: F401
from .normalize import full_to_half, squeeze_space, ascii_ratio, cjk_ratio  # noqa: F401
