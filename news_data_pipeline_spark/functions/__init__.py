from news_data_pipeline_spark.functions import columns, ids, text

__all__ = ["columns", "ids", "text"]
