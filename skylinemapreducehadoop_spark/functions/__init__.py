from skylinemapreducehadoop_spark.functions.profile import profile

__all__ = ["profile"]
