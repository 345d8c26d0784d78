from towhee_spark.plans.explain import plan_stats, assert_pushed_filters, assert_max_exchanges
from towhee_spark.plans.profile import plan_profile, profile_run, metric_total, format_profile

__all__ = [
    "plan_stats", "assert_pushed_filters", "assert_max_exchanges",
    "plan_profile", "profile_run", "metric_total", "format_profile",
]
