from .gridspec import GridSpec  # noqa: F401
