from . import tpch  # noqa: F401
