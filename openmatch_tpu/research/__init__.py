from .mlm import MLMModel, mask_tokens  # noqa: F401
from .meta_ltr import meta_reweight_step  # noqa: F401
from .reinfoselect import DataSelectionPolicy, reinfoselect_round  # noqa: F401
