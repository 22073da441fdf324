from .mips import (Searcher, exact_search, query_sharded_search,  # noqa: F401
                   sharded_search)
