from .tables import load, load_all  # noqa: F401
