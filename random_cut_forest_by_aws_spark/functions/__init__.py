from .features import token_features, FEATURE_NAMES  # noqa: F401
