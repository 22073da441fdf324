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
