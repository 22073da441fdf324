"""Memory-bounded partition-serial retrieval
(reference driver/successive_retrieve.py)."""

from __future__ import annotations

from ..retriever.retriever import SuccessiveRetriever
from .retrieve import main as _retrieve_main


def main(argv=None):
    _retrieve_main(argv, retriever_cls=SuccessiveRetriever)


if __name__ == "__main__":
    main()
