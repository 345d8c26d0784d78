from towhee_spark.plans.explain import plan_stats, assert_pushed_filters, assert_max_exchanges

__all__ = ["plan_stats", "assert_pushed_filters", "assert_max_exchanges"]
