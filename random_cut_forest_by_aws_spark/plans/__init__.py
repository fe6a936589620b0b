from .suite import ValidationSuite, SuiteConfig, ValidationResult  # noqa: F401
