from .forest import RCFForest  # noqa: F401
from .thresholder import BasicThresholder  # noqa: F401
