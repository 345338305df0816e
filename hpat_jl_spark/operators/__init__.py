"""HPAT-surface operators re-expressed as DataFrame transformations.

relational — filter / join / aggregate / vcat (the reference's complete
             relational surface, reference src/capture-api.jl)
windowed   — stencil, cumsum, rank/top-k (ordered-column operators)
setops     — distinct / intersect / except (new surface; trivial in Spark)
"""

from hpat_jl_spark.operators.relational import (  # noqa: F401
    aggregate,
    count_unique,
    join,
    table_filter,
    table_vcat,
)
from hpat_jl_spark.operators.windowed import cumsum, stencil_3pt, top_k  # noqa: F401
