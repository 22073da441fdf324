from .train_dataset import DRTrainDataset, RRTrainDataset  # noqa: F401
from .collators import QPCollator, PairCollator  # noqa: F401
from .inference_dataset import InferenceDataset  # noqa: F401
from .loader import batched, prefetch  # noqa: F401
