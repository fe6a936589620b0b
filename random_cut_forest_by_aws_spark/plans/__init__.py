from .suite import ValidationSuite, SuiteConfig, ValidationResult  # noqa: F401
from .pipeline import CurationConfig, CurationResult, curate_corpus  # noqa: F401
