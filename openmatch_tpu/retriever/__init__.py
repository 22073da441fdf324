from .encoder import encode_dataset, save_embeddings, load_embeddings  # noqa: F401
from .retriever import Retriever, SuccessiveRetriever  # noqa: F401
from .reranker import Reranker  # noqa: F401
