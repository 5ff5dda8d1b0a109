from . import checkpoint, config, convert, logging, metrics  # noqa: F401
