"""Rollup layer: series derivation, retention tiers, gap-fill."""

from .tiers import (  # noqa: F401
    TIERS,
    TIER_ORDER,
    bucket_expr,
    cascade,
    incremental_refresh,
    merge_tier,
    rollup_from_raw,
    salted_rollup,
    write_tier,
)
from .gapfill import TIER_SECONDS, gap_fill_linear, gap_fill_locf  # noqa: F401
from .compact import compact_tier, file_stats  # noqa: F401
from .changepoint import auto_penalty, pelt_changepoints, pelt_grouped  # noqa: F401
from .zorder import zorder_write, zvalue, zvalue_sql  # noqa: F401
from .drift import (  # noqa: F401
    benford_digits,
    chi2_drift,
    ks_drift,
    mannwhitney_drift,
    page_hinkley,
    psi_drift,
    tv_drift,
)
from .features import (  # noqa: F401
    nonlinearity_stats,
    perm_entropy,
    sample_entropy,
    trimmed_mean,
    ts_features,
)
from .freqsketch import cm_build_tier, cm_cascade, cm_estimate  # noqa: F401
from .router import range_segments, route_range  # noqa: F401
from .distinct import cascade_distinct, distinct_sketch_tier, with_estimate  # noqa: F401
from .patterns import pattern_topk, pattern_topk_kernel  # noqa: F401
from .resample import resample_grid  # noqa: F401
from .labelindex import build_label_index, series_by_labels  # noqa: F401
from .promql import (  # noqa: F401
    extrapolated_increase,
    histogram_quantile,
    predict_linear,
)
from .reconcile import topdown_reconcile  # noqa: F401
from .periodicity import (  # noqa: F401
    acf_dominant_period,
    dft_daily,
    multi_seasonal_profile,
)
from .intervals import hopping_rollup, merge_intervals  # noqa: F401
from .series import domain_hourly_series, text_identity_fingerprint, with_domain  # noqa: F401
from .retention import (  # noqa: F401
    DEFAULT_POLICY,
    downsample_on_expiry,
    enforce_policy,
    enforce_retention,
    retention_cost_plan,
)
from .downsample import (  # noqa: F401
    ewma_smooth,
    lttb_downsample,
    lttb_indices,
    asap_smooth_params,
    asap_window_search,
    m4_downsample,
    ohlc_bars,
)
from .forecast import (  # noqa: F401
    conformal_band,
    conformal_interval,
    cusum_changepoints,
    cusum_grouped,
    holt_forecast,
    holt_residuals_grouped,
    holt_winters,
    croston_grouped,
    holt_winters_grouped,
    rolling_backtest,
)
from .matrixprofile import (  # noqa: F401
    discords_grouped,
    matrix_profile,
    matrix_profile_grouped,
    motifs_grouped,
    top_discords,
    top_motifs,
)
from .trend import (  # noqa: F401
    dtw_banded,
    dtw_pairs_grouped,
    mann_kendall_grouped,
    mann_kendall_stats,
    ols_trend_exact,
    theil_sen_grouped,
    theil_sen_slope,
)
from .analytics import (  # noqa: F401
    anomaly_ensemble,
    autocorrelation,
    burst_intervals,
    burstiness,
    calendar_compare,
    markov_entropy_rate,
    poisson_delta_significance,
    series_health,
    topk_other,
    decayed_popularity,
    duration_above,
    exp_histogram,
    gap_percentiles,
    gap_regularity,
    weighted_median,
    cohort_retention,
    counter_rate,
    hampel_filter,
    last_touch_attribution,
    counter_repair,
    linear_attribution,
    windowed_funnel,
    session_patterns,
    transition_matrix,
    mad_outliers,
    paa_sax,
    rolling_active_users,
    rolling_quantile,
    seasonal_decompose,
    seasonal_strength,
    seasonal_naive_error,
    correlation_matrix,
    seasonal_outliers,
    series_churn,
    staleness_report,
    series_cross_correlation,
    time_weighted_avg,
)
from .slo import DEFAULT_RULES, alert_hysteresis, slo_burn_rates  # noqa: F401
from .rootcause import delta_attribution  # noqa: F401
from .refresh import invalidate_and_refresh, invalidation_set  # noqa: F401
from .ingest import lww_compact, out_of_order_stats  # noqa: F401
from .promql import resets_changes  # noqa: F401
from .distinct import kmv_cascade, kmv_estimate, kmv_set_ops, kmv_sketch_tier, kmv_sliding  # noqa: F401
from .labelindex import label_cardinality  # noqa: F401
from .ivm import ivm_join_delta, ivm_join_maintain  # noqa: F401
from .bitemporal import bitemporal_asof  # noqa: F401
from .evolution import align_to_schema, read_evolved  # noqa: F401
from .ingest import cdc_apply  # noqa: F401
from .integrity import merkle_changed, merkle_tiers  # noqa: F401
from .ingest import watermark_tuning  # noqa: F401
from .peaks import peak_prominence  # noqa: F401
from .analytics import rolling_corr  # noqa: F401
from .trend import hurst_rs  # noqa: F401
from .controlchart import control_chart_flags  # noqa: F401
from .esd import esd_lambdas_q6, seasonal_esd_grouped, t_quantile  # noqa: F401
from .vopt import vopt_boundaries, vopt_histogram_grouped  # noqa: F401
from .compact import compaction_plan  # noqa: F401
from .wavelet import haar_coefficients, haar_topk_grouped  # noqa: F401
from .drift import wasserstein_drift  # noqa: F401
from .controlchart import runs_test  # noqa: F401
from .analytics import spearman_corr  # noqa: F401
from .analytics import funnel_with_exclusion  # noqa: F401
