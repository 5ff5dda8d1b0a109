from . import evaluate, test, train  # noqa: F401
