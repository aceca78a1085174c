from netflix_data_ingestion_spark.functions import datetime as datetime_fns  # noqa: F401
from netflix_data_ingestion_spark.functions import vectors  # noqa: F401
