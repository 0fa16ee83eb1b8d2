from user_feed_cdc_spark.functions.numeric import round_half_up, sql_round_half_up

__all__ = ["round_half_up", "sql_round_half_up"]
