"""Explicit plan-sweep allowlist (VERDICT r4 item 5).

Queries listed here carry a CONDITIONED BroadcastNestedLoopJoin whose
build side is bounded BY CONSTRUCTION (a driver literal, a scalar
aggregate, or a label/day/source-bounded table that does not grow with
data volume), or are documented fenced exact baselines whose quadratic
cost is the point.  Condition-less 1-row-total cross broadcasts are
allowed by rule (plato_spark/engine/plan_audit.py) and need no entry.

Every entry was verified by reading the query plan at sf0.001
(tools/plan_sweep.py) and the source: the BNLJ stream side is the big
table exactly once, the build side is the bounded one.
"""

_QK = ("histogram-quantile kernel (functions/quantiles): pick-first-bin "
       "is a |quantiles|-row literal broadcast against <=nbins cum rows "
       "with a cum>=rank condition — bounded at any data scale")
_TOPK = ("top-k share: the k-value literal (2-3 rows) broadcast against "
         "the ranked/cumulative table with a rank<=k condition — bounded")
_GRID = ("label/type-pair grid: both sides bounded by the label universe "
         "(|labels|^2 cells is the documented output), independent of "
         "row volume")
_FENCED = ("documented fenced exact baseline: the all-pairs/brute-force "
           "yardstick IS the semantics (recall/accuracy audit vs the "
           "bucketed production path) — VERDICT r3/r4 blessed pattern")
_SCALAR = ("scalar-aggregate compare: 1-row broadcast total/avg/max in a "
           "non-equi predicate — bounded build side, one pass stream side")
_DAYS = ("day-bounded pair/band set over the pre-aggregated per-day "
         "table: days do not scale with data volume (the bounded-offsets "
         "argument, documented in the query docstring)")

ALLOW: dict[str, str] = {
    # --- histogram / group quantile kernel users ---
    "price_quantiles": _QK,
    "degree_quantiles": _QK,
    "session_gaps": _QK,
    "reorder_gaps": _QK,
    "lifetime_quantiles": _QK,
    "conversion_latency": _QK,
    "norm_quantiles": _QK,
    "open_order_aging": _QK + "; aged against a broadcast scalar last-date",
    "weighted_median_discount": ("weighted-median rank pick over the "
                                 "<=|distinct discounts| (11-value) "
                                 "cumulative table — bounded domain"),
    # --- top-k concentration shares ---
    "revenue_concentration": _TOPK,
    "pagerank_concentration": _TOPK,
    "vocab_coverage": _TOPK,
    # --- bounded label/type grids ---
    "centroid_similarity": _GRID,
    "audience_jaccard": _GRID,
    "davies_bouldin": _GRID,
    "kmv_jaccard": _GRID + " (source pairs)",
    # --- fenced exact baselines (recall / duplicate ground truth) ---
    "ann_topk": _FENCED,
    "ivf_recall": _FENCED,
    "lsh_recall": _FENCED,
    "pq_recall": _FENCED,
    "matryoshka_recall": _FENCED,
    "rrf_fusion": _FENCED + " (fuses the exact channel)",
    "knn_label_noise": _FENCED + " (Wilson editing needs exact kNN)",
    "rbm_pairs": _FENCED + " (mutual exact top-1)",
    "containment_dups": _FENCED,
    "ngram_jaccard_dups": _FENCED,
    "similarity_threshold": _FENCED,
    # --- scalar-aggregate compares ---
    "dormant_customers": _SCALAR,
    # --- day-bounded pair/band sets ---
    "theil_sen_trend": _DAYS,
    "ewma_revenue": _SCALAR + " (1-row min/max day bounds gate the "
                    "full-history filter; the decay itself is an "
                    "explode+equi-join EXPAND x20)",
}
