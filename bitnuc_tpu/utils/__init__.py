from . import bitops  # noqa: F401
