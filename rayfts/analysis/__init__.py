from rayfts.analysis.analyzer import (  # noqa: F401
    Analyzer,
    AnalyzerSpec,
    TOKEN_RE_SQL,
    get_spec,
    register_analyzer,
)
from rayfts.analysis.porter2 import stem  # noqa: F401
