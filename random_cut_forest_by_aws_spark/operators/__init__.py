from .stats import column_stats, numeric_profile  # noqa: F401
from .uniqueness import uniqueness_violations, uniqueness_verdict  # noqa: F401
from .referential import referential_violations, referential_verdict  # noqa: F401
from .constraints import row_invariant_violations, token_equality_violations  # noqa: F401
