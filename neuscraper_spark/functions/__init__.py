from .text import strip_ws, strip_ws_py, unescape_gold, unescape_gold_py  # noqa: F401
