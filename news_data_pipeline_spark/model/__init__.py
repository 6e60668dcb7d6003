from news_data_pipeline_spark.model.star import build_dim, build_fact, dim_date

__all__ = ["build_dim", "build_fact", "dim_date"]
