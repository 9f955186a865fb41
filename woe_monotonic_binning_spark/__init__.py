"""PySpark-native Monotone Optimal Binning engine.

Re-expresses the full capability surface of PedroHBM/woe-monotonic-binning
(a single-node pandas fit/transform library) as an idiomatic Spark engine —
relational stages in Spark SQL, the iterative merge loops in a grouped-map
pandas UDF over pre-aggregated summaries — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
event windows, multimodal plumbing) under ``operators``/``streaming``.
"""

from .fit import (
    BINS_SCHEMA_DDL,
    batch_woe_binning,
    fit_bins,
    merge_bins,
    unpack_woe,
    woe_binning,
    woe_binning_sep,
)
from .transform import apply_bins
from .drift import (
    baseline_fractions,
    characteristic_stability,
    iv_summary,
    psi_report,
    psi_report_quantile,
    psi_summary,
    stability_over_periods,
)
from .session import get_spark
from ._algo import BINS_COLUMNS, FitParams
from .ml import WOEBinner, WOEBinnerModel
from .pipeline import curate_corpus
from .profile import check_expectations, column_profile
from .quality import QualityClassifierModel, train_quality_classifier
from .langid import LanguageIDModel, train_language_id
from .perplexity import NGramLMModel, train_ngram_lm

__all__ = [
    "BINS_COLUMNS",
    "BINS_SCHEMA_DDL",
    "FitParams",
    "WOEBinner",
    "WOEBinnerModel",
    "apply_bins",
    "baseline_fractions",
    "batch_woe_binning",
    "characteristic_stability",
    "check_expectations",
    "column_profile",
    "curate_corpus",
    "fit_bins",
    "iv_summary",
    "merge_bins",
    "get_spark",
    "psi_report",
    "psi_report_quantile",
    "psi_summary",
    "QualityClassifierModel",
    "train_quality_classifier",
    "LanguageIDModel",
    "train_language_id",
    "NGramLMModel",
    "train_ngram_lm",
    "stability_over_periods",
    "unpack_woe",
    "woe_binning",
    "woe_binning_sep",
]

__version__ = "0.1.0"
