from .bert import BertConfig, BertEncoder  # noqa: F401
from .pooling import pool_hidden, LinearHead  # noqa: F401
