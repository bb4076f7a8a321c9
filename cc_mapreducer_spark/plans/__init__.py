from cc_mapreducer_spark.plans.inspect import count_exchanges, formatted_plan

__all__ = ["count_exchanges", "formatted_plan"]
