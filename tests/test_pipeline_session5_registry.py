"""Every operator added in round-2 session-5 must be reachable as a
JSON pipeline stage (registration drift guard; execution smoke for
the multi-input ones lives in the per-batch stage tests)."""

from pdal_spark.plans.pipeline import REGISTRY

SESSION5_STAGES = [
    "filters.location_quotient", "filters.relative_risk",
    "filters.huff", "filters.two_sfca", "filters.cross_track",
    "filters.gwr", "filters.stay_points", "filters.flock",
    "filters.fleiss", "filters.krippendorff", "filters.bilinear",
    "filters.focal_curvature", "filters.zonal_majority",
    "filters.circular_stats", "filters.semivariogram_directional",
    "filters.albers", "filters.spherical_perimeter",
    "filters.radius_of_gyration", "filters.bivariate_moran",
    "filters.spatial_markov", "filters.trajectory_entropy",
    "filters.spacetime_scan", "filters.qlm", "filters.hoover",
    "filters.theil_inequality", "filters.dda_cells",
    "filters.line_density", "filters.head_tail_breaks",
    "filters.route_waypoints", "filters.runs_test",
    "filters.segregation", "filters.compression_ratio",
    "filters.spearman", "filters.simpson", "filters.ransac_line",
    "filters.nelson_aalen", "filters.diff_in_diff", "filters.ipf",
    "filters.ccf", "filters.granger", "filters.partial_corr",
    "filters.brier", "filters.trimmed_mean",
    "filters.quantile_normalize", "filters.conformal",
    "filters.fairness", "filters.fellegi_sunter",
    "filters.weighted_median", "filters.edit_join",
    "filters.lcs_pairs", "filters.rolling_slope",
    "filters.chi_square", "filters.g_test", "filters.odds_ratio",
    "filters.mcnemar", "filters.weighted_kappa", "filters.icc",
    "filters.cronbach", "filters.capture_recapture",
    "filters.chao1", "filters.mark_correlation",
    "filters.time_weighted_avg", "filters.state_durations",
    "filters.bh_fdr", "filters.periodogram", "filters.xmr",
    "filters.route_profile", "filters.rhumb_line",
    "filters.solar_position", "filters.knee_point",
    "filters.anova", "filters.eb_rates",
]


def test_session5_stages_registered():
    missing = [s for s in SESSION5_STAGES if s not in REGISTRY]
    assert not missing, missing
