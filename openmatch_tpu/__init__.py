"""OpenMatch-TPU: a TPU-native dense retrieval / reranking framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
thunlp/OpenMatch (reference layout documented in SURVEY.md):

- Bi-encoder dense retrieval (``models.dr_model``) with in-batch and
  cross-device contrastive negatives, GradCache-style chunked training.
- Cross-encoder reranking (``models.rr_model``) incl. monoT5 two-token scoring.
- A sharded exact-MIPS engine (``ops.mips``) replacing faiss.
- Streaming host-side data pipeline with deterministic sharding (``data``).
- Native TREC metrics (``utils.metrics``) replacing pytrec_eval.
- v1-parity neural rerankers (KNRM/Conv-KNRM/TK/EDRM) and classic LeToR.
"""

__version__ = "0.1.0"

# Public API conveniences (submodules import lazily where heavy).
from .config import (  # noqa: F401,E402
    ArgumentParser,
    DataArguments,
    InferenceArguments,
    ModelArguments,
    TrainingArguments,
)
from .utils.trec import (  # noqa: F401,E402
    load_from_trec,
    merge_retrieval_results_by_score,
    save_as_trec,
)
from .utils.metrics import evaluate_run, eval_mrr, Metric  # noqa: F401,E402
