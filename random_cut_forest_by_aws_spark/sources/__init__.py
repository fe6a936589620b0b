from .sequences import sequences, sources_dim  # noqa: F401
from .tables import load_table, register_views, TABLES  # noqa: F401
from .tokenize import tokenized_documents  # noqa: F401
