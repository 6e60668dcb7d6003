from news_data_pipeline_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
