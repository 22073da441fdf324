from .mips import exact_search, sharded_search  # noqa: F401
