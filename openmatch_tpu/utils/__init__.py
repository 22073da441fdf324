from .trec import (  # noqa: F401
    load_from_trec,
    merge_retrieval_results_by_score,
    save_as_trec,
)
from ..templates import fill_template, find_all_markers  # noqa: F401
