from news_data_pipeline_spark.operators import dedup, joins, similarity

__all__ = ["dedup", "joins", "similarity"]
