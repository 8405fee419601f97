"""Results layer: paper-figure computations and reports.

Port of the reference's src/Results/ scripts (ModelPerformance.py,
FacilitiesMaps.py, tonnage_estimates.py, upper_bound_calculation.R,
generate_facilities.py) with the statistics vectorized and the plotting on
matplotlib only.
"""

from aquaculture_tpu.results.performance import (  # noqa: F401
    stats_at_thresholds,
    plot_precision_recall_curves,
)
from aquaculture_tpu.results.upper_bound import upper_bound_simulation  # noqa: F401
